#!/usr/bin/env bash
# Launcher for the constant_multiscale_rp_adain_global_mst experiment (single host; multi-chip via mesh_shape
# in the config — no per-device env pinning needed on TPU).
exec python train.py --config configs/train_constant_multiscale_rp_adain_global_mst.yaml "$@"
