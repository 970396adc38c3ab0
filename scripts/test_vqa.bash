#!/bin/bash
# vqa test-split inference + leaderboard/CSV dump (reference
# README.md:117-136; the reference's own test bash scripts are absent
# from its repo).
python -m xlxmert_tpu.cli.vqa \
    --test test --load snap/vqa/BEST \
    --data_root data --vocab data/vocab.txt \
    --output snap/vqa "$@"
