#!/usr/bin/env bash
# Launcher for the static_sanet experiment (single host; multi-chip via mesh_shape
# in the config — no per-device env pinning needed on TPU).
exec python train.py --config configs/train_static_sanet.yaml "$@"
