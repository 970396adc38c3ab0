#!/bin/bash
# Text-to-image sampling (reference x-lxmert/scripts/sample_images.sh).
python -m xlxmert_tpu.cli.sample_images \
    --load snap/pretrained/x_lxmert/Epoch20_LXRT.pth \
    --centroids data/cluster_centroids/maskrcnn_mscoco_train_centroids10000_iter20_d2048_grid8.npy \
    --generator snap/pretrained/G_60.pth \
    --sentences example_sentences.txt \
    --sample_steps 4 --output samples "$@"
