#!/bin/bash
# Serialized on-hardware measurement batch — fires once when the axon
# tunnel returns. Logs to /tmp/hw_all.log; box must stay otherwise idle.
cd /root/repo
exec > /tmp/hw_all.log 2>&1
set -x
date
export PYTHONPATH=/root/.axon_site:src
# folded-helper semantics FIRST: a jax/libtpu update can reintroduce the
# 2026-08-20 half-lane-concat miscompilation (NOTES.md round-5) and every
# downstream equality check would then pass self-consistently-wrong
timeout 900 python -u tools/hw/hw_folded_semantics_check.py
timeout 1800 python tools/hw_kernel_check.py
timeout 1800 python -u tools/hw/hw_q8_check.py
timeout 3600 python -u tools/hw/hw_q8_bench.py
timeout 1800 python bench.py
timeout 1800 python bench.py --train
timeout 2400 python -u tools/hw/hw_target_cache.py 16 24
timeout 3600 python bench.py --all > /tmp/hw_bench_all.json 2>> /tmp/hw_all.log || true
cat /tmp/hw_bench_all.json
timeout 1800 python bench.py --hires
timeout 1800 python -u tools/hw/hw_daemon_bench.py
date
echo HW_ALL_DONE
