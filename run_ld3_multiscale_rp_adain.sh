#!/usr/bin/env bash
# Launcher for the ld3_multiscale_rp_adain experiment (single host; multi-chip via mesh_shape
# in the config — no per-device env pinning needed on TPU).
exec python train.py --config configs/train_ld3_multiscale_rp_adain.yaml "$@"
