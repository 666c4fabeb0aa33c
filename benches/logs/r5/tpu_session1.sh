#!/bin/bash
# r5 TPU session 1: selftest -> full v2 suite matrix -> headline bench
cd /root/repo
echo "=== selftest $(date) ==="
python -m webgpufft_tpu.selftest
echo "=== suite $(date) ==="
python benches/suite.py | tee benches/logs/r5/suite_r5.jsonl
echo "=== bench $(date) ==="
python bench.py
echo "=== done $(date) ==="
