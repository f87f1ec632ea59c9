#!/bin/bash
# Fetch the reference's released checkpoints (URLs from the reference
# README.md:69-78 and cwm/models/raft/download_raft_checkpoints.sh), then
# convert them to native orbax checkpoints with convert_checkpoints.py.
#
# Usage: scripts/download_checkpoints.sh [CKPT_DIR]
set -euo pipefail

ckpt_dir=${1:-"./checkpoints"}
raft_dir="${ckpt_dir}/raft_checkpoints"
mkdir -p "$ckpt_dir" "$raft_dir"

S3=https://counterfactual-world-modeling.s3.amazonaws.com
for f in cwm_baseVMAE_224px_8x8patches_2frames.pth \
         cwm_largeVMAE_224px_4x4patches_2frames.pth \
         cwm_IMUcond_conjVMAE_224px_4x4patches_2frames.pth \
         flow2imu_conjVMAE_224px.pth \
         raft_consolidated_keypoint_predictor.pth; do
    # skip only non-empty files; a failed wget leaves a 0-byte -O target,
    # which must not defeat the retry on the next round
    if [ ! -s "${ckpt_dir}/${f}" ]; then
        wget -O "${ckpt_dir}/${f}" "${S3}/${f}" \
            || rm -f "${ckpt_dir}/${f}"
    fi
done

# RAFT weights (princeton-vl release, via the reference's dropbox mirror)
if [ ! -f "${raft_dir}/raft-large.pth" ]; then
    wget -O /tmp/raft_models.zip https://www.dropbox.com/s/4j4z58wuv8o0mfz/models.zip
    unzip -o /tmp/raft_models.zip -d /tmp/raft_models
    mv /tmp/raft_models/models/raft-sintel.pth "${raft_dir}/raft-large.pth"
    mv /tmp/raft_models/models/raft-small.pth "${raft_dir}/raft-small.pth"
    rm -rf /tmp/raft_models /tmp/raft_models.zip
fi

echo "Downloaded:"
ls "$ckpt_dir" "$raft_dir"
echo
echo "Convert to flax/orbax with:"
echo "  python scripts/convert_checkpoints.py --ckpt-dir ${ckpt_dir}"
