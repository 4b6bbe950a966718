#!/bin/sh
# Round-5 quality sweep, part B: augment won part A (0.854 -> 0.938;
# cosine LR flat alone, slightly worse combined). Combine augment with
# the other live gradients: gallery-tree natural coverage (n_aug) and
# training length (augmentation de-memorises, so more epochs may help).
set -x
cd /root/repo
RUN="env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python benchmarks/retrieval_quality.py --no-floor --no-fidelity"
$RUN --confusion --augment --n-aug 10             > /tmp/rq_aug_naug10.log 2>&1
$RUN --confusion --augment --epochs 30            > /tmp/rq_aug_e30.log 2>&1
$RUN --confusion --augment --n-aug 10 --epochs 30 > /tmp/rq_aug_naug10_e30.log 2>&1
echo SWEEP_B_DONE
