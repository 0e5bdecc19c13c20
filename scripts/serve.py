#!/usr/bin/env python
"""Style-transfer HTTP serving daemon (see ast_tpu/serve.py).

    python scripts/serve.py --port 8742 --checkpoint-dir checkpoints
    curl -X POST --data-binary @clip.wav \
        'http://127.0.0.1:8742/transfer?target=violin' -o out.wav
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ast_tpu.serve import main

if __name__ == "__main__":
    main()
