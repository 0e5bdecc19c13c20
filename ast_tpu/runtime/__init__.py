"""Native C++ runtime: wav+mp3 codecs + polyphase resampler (built on first use by build.py)."""
