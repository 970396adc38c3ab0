#!/bin/bash
# SPADE GAN recipe (reference image_generator/scripts/train_generator.bash).
python -m xlxmert_tpu.cli.train_generator \
    --images_dir data/coco/train2014 \
    --centroids data/cluster_centroids/maskrcnn_mscoco_train_centroids10000_iter20_d2048_grid8.npy \
    --cluster_pkl data/cluster_ids/maskrcnn_train_grid8_img_id_to_cluster_id_10000_iter20_d2048_grid8.pkl \
    --g_base_dim 32 --d_base_dim 64 \
    --resize_target_size 256 --batch_size 16 --epochs 101 \
    --output snap/generator "$@"
