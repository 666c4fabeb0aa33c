#!/bin/bash
# r5 TPU session 5 (after the per-core-type chunk fix, commit d0a7a4f):
#   wait for session 4's in-flight r33 to finish -> deep selftest ->
#   full v2 suite (suite_r5c.jsonl; session 4's run crashed at the
#   c2c_1d_4096_b4096 compile OOM) -> updated r33 probe.
# Runs to completion; never killed (CLAUDE.md TPU rules).
cd /root/repo
LOG=benches/logs/r5
for i in $(seq 1 24); do
  [ -f $LOG/session4.done ] || [ -f $LOG/session4.gaveup ] && break
  sleep 300
done
echo "=== session5 start $(date) ===" >> $LOG/session5.log
if python benches/tpu_health_probe.py > $LOG/health5.json 2>> $LOG/session5.log; then
  cat $LOG/health5.json >> $LOG/session5.log
  echo "=== deep selftest $(date) ===" >> $LOG/session5.log
  python -m webgpufft_tpu.selftest --deep >> $LOG/session5.log 2>&1
  echo "=== suite (post chunk-policy fix) $(date) ===" >> $LOG/session5.log
  python benches/suite.py > $LOG/suite_r5c.jsonl 2>> $LOG/session5.log
  echo "=== r33 (updated) $(date) ===" >> $LOG/session5.log
  python benches/r33_c2c_chunk_ab.py > $LOG/r33b.log 2>&1
  echo "=== bench.py $(date) ===" >> $LOG/session5.log
  python bench.py >> $LOG/session5.log 2>&1
  echo "=== session5 done $(date) ===" >> $LOG/session5.log
  touch $LOG/session5.done
else
  echo "=== session5 probe failed $(date) ===" >> $LOG/session5.log
fi
