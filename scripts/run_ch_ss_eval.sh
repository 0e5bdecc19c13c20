#!/bin/sh
# Post-run evaluation of the chorale scheduled-sampling checkpoint
# (round-4 flagship): held-out AR tracking, then the reference's own
# reconstruction + transfer drivers, all under the demonstrated-working
# configuration. One command so the chip stays busy back-to-back.
set -e
CKPT=${1:-demo/ckpt_ch_ss}
python scripts/ar_tracking_check.py \
    --test-dir demo/corpus_ch/test --checkpoint-dir "$CKPT" \
    --stats-dir demo/corpus_ch/stats --out demo/ar_tracking_ch_ss --unfaithful
python scripts/evaluate.py \
    --test-dir demo/corpus_ch/test --checkpoint-dir "$CKPT" \
    --stats-dir demo/corpus_ch/stats --unfaithful --mode reconstruction \
    --recon-out demo/recon_out_ch_ss
echo EVAL_DONE
