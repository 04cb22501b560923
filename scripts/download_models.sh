#!/usr/bin/env bash
# Acquire + convert the reference checkpoints (counterpart of the reference's
# download_MeshTransformer_models.sh, generalised to every model this
# framework can load). Run on a machine with network access, then copy
# records/ to the TPU host.
set -euo pipefail

mkdir -p records downloads

echo "== Detectron2 released COCO weights (reference object_detection.py:18,23)"
curl -L -o downloads/pointrend_x101.pkl \
  https://dl.fbaipublicfiles.com/detectron2/PointRend/InstanceSegmentation/pointrend_rcnn_X_101_32x8d_FPN_3x_coco/28119989/model_final_ba17b9.pkl
curl -L -o downloads/keypoint_r101.pkl \
  https://dl.fbaipublicfiles.com/detectron2/COCO-Keypoints/keypoint_rcnn_R_101_FPN_3x/138363331/model_final_997cc7.pkl

python scripts/convert_weights.py pointrend downloads/pointrend_x101.pkl records/pointrend_x101_tpu
python scripts/convert_weights.py keypoint downloads/keypoint_r101.pkl records/keypoint_r101_tpu

echo "== AFB-URR video checkpoint (place the reference's"
echo "   records/video_seg_checkpoint_*.pth in downloads/ first)"
if ls downloads/video_seg_checkpoint_*.pth >/dev/null 2>&1; then
  python scripts/convert_weights.py afb_urr downloads/video_seg_checkpoint_*.pth records/video_seg_tpu
fi

echo "== Image model: the reference ships a whole-model smp pickle that"
echo "   requires segmentation_models_pytorch to unpickle; retrain with"
echo "   train_image_seg.py instead (see docs/ROADMAP.md)."

echo "== METRO body-mesh weights: HRNet-w64 conversion pending"
echo "   (docs/ROADMAP.md); the in-process regressor trains from scratch."
