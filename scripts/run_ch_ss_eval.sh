#!/bin/sh
# Post-run evaluation of the chorale scheduled-sampling checkpoint
# (round-5 flagship): held-out AR tracking, then the reference's own
# reconstruction AND transfer drivers, then the direction check, all under
# the demonstrated-working configuration. One command so the chip stays
# busy back-to-back.
set -e
CKPT=${1:-demo/ckpt_ch_ss}
SUFFIX=${2:-ch_ss}
STATS=${3:-demo/corpus_ch/stats}
# ar_tracking_check exits 1 when the tracking bar is missed; that verdict is
# recorded in its JSON — it must not abort the recon/transfer drivers below.
python scripts/ar_tracking_check.py \
    --test-dir demo/corpus_ch/test --checkpoint-dir "$CKPT" \
    --stats-dir "$STATS" --out "demo/ar_tracking_$SUFFIX" --unfaithful \
    || echo "ar_tracking bar missed (recorded in demo/ar_tracking_$SUFFIX)"
python scripts/evaluate.py \
    --test-dir demo/corpus_ch/test --checkpoint-dir "$CKPT" \
    --stats-dir "$STATS" --unfaithful --mode both \
    --recon-out "demo/recon_out_$SUFFIX" --transfer-out "demo/st_out_$SUFFIX"
python scripts/direction_check.py \
    --test-dir demo/corpus_ch/test --checkpoint-dir "$CKPT" \
    --stats-dir "$STATS" --out "demo/direction_check_$SUFFIX" --unfaithful
echo EVAL_DONE
