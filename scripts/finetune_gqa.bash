#!/bin/bash
# gqa finetuning (reference README.md:117-136; the reference's own
# finetune bash scripts are absent from its repo).
python -m xlxmert_tpu.cli.gqa \
    --loadLXMERTQA snap/pretrain/Epoch20_LXRT \
    --data_root data --vocab data/vocab.txt \
    --output snap/gqa "$@"
