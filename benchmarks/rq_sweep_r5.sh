#!/bin/sh
# Round-5 retrieval-quality sweep (VERDICT r4 item 7): diagnose the
# 0.854 plateau (confusion matrices), then measure the two new train
# levers (train-time augmentation, warmup-cosine LR) and the known-live
# n_aug gradient. Sweep mode (--no-floor --no-fidelity) — the floor and
# tier-fidelity numbers are config-independent headline work, re-run
# once at the winning config. Sequential: ONE CPU core on this VM.
set -x
cd /root/repo
RUN="env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python benchmarks/retrieval_quality.py --no-floor --no-fidelity"
$RUN --confusion                          > /tmp/rq_base.log 2>&1
$RUN --confusion --augment                > /tmp/rq_aug.log 2>&1
$RUN --lr-schedule cosine                 > /tmp/rq_cos.log 2>&1
$RUN --confusion --augment --lr-schedule cosine > /tmp/rq_augcos.log 2>&1
$RUN --n-aug 10                           > /tmp/rq_naug10.log 2>&1
$RUN --n-aug 10 --augment --lr-schedule cosine  > /tmp/rq_naug10_augcos.log 2>&1
echo SWEEP_DONE
