#!/bin/bash
# gqa test-split inference + leaderboard/CSV dump (reference
# README.md:117-136; the reference's own test bash scripts are absent
# from its repo).
python -m xlxmert_tpu.cli.gqa \
    --test test --load snap/gqa/BEST \
    --data_root data --vocab data/vocab.txt \
    --output snap/gqa "$@"
