#!/bin/bash
# nlvr2 test-split inference + leaderboard/CSV dump (reference
# README.md:117-136; the reference's own test bash scripts are absent
# from its repo).
python -m xlxmert_tpu.cli.nlvr2 \
    --test test --load snap/nlvr2/BEST \
    --data_root data --vocab data/vocab.txt \
    --output snap/nlvr2 "$@"
