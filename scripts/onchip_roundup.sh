#!/bin/bash
# One-shot on-chip validation + measurement after kernel changes.
# Run when the TPU tunnel is healthy:  bash scripts/onchip_roundup.sh
# Writes everything to /tmp/roundup/.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/roundup

echo "== 1. on-chip kernel/model parity (tests/test_tpu_parity.py)"
MVLT_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_parity.py -q \
    2>&1 | tail -5 | tee /tmp/roundup/parity.txt

echo "== 2. stored-backward stage profile"
timeout 1500 python scripts/profile_stored_bwd.py 1 2 3 \
    2>&1 | tail -6 | tee /tmp/roundup/stored_bwd.txt

echo "== 3. fusion halves profile"
timeout 900 python scripts/profile_fusion_bwd.py \
    2>&1 | tail -6 | tee /tmp/roundup/fusion_bwd.txt

echo "== 4. train decomposition (swin/fusion fwd+bwd)"
timeout 900 python scripts/train_split.py \
    2>&1 | tail -8 | tee /tmp/roundup/train_split.txt

echo "== 5. pretrain step throughput (bench line)"
timeout 900 python bench.py --mode pretrain \
    2>&1 | tail -3 | tee /tmp/roundup/pretrain.txt

echo "== 5b. pretrain step with IN-KERNEL attention dropout"
MVLT_KERNEL_DROPOUT=1 timeout 900 python bench.py --mode pretrain \
    2>&1 | tail -3 | tee /tmp/roundup/pretrain_kdrop.txt

echo "== 6. full bench"
timeout 1800 python bench.py 2>&1 | tail -3 | tee /tmp/roundup/bench.txt

echo "== roundup done; artifacts in /tmp/roundup/"
