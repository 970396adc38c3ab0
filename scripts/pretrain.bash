#!/bin/bash
# Canonical pretraining recipe (reference x-lxmert/scripts/pretrain.bash:11-30)
# on the TPU-native stack. Adjust --data_root/--vocab to your layout.
# The reference default initializes from bert-base-uncased: add
#   --bert_weights path/to/bert-base-uncased/pytorch_model.bin
# (or --fromScratch to opt out, matching param.py:90-93).
python -m xlxmert_tpu.cli.pretrain \
    --taskMaskLM --taskObjPredict --taskMatched \
    --visualLosses obj \
    --vis_mask_predict --vis_mask_COCOVG_only \
    --clustering --grid_model --grid_size 8 --feat_dim 2048 \
    --llayers 9 --rlayers 5 --xlayers 5 \
    --lr 1e-4 --epochs 20 --batchSize 256 \
    --train mscoco_train,mscoco_nominival,vgnococo \
    --valid mscoco_minival \
    --data_root data --vocab data/vocab.txt \
    --output snap/pretrain "$@"
