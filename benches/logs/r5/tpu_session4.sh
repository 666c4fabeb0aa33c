#!/bin/bash
# r5 TPU session 4: the post-fix artifacts STATUS_r6 promised —
#   deep selftest (miscompile guard on-chip) -> full v2 suite re-run
#   (suite_r5b.jsonl) -> headline bench -> r33 lax.map-vs-unroll A/B.
# Retry-watcher pattern (CLAUDE.md rule 7): probe first, sleep 600 on
# failure, give up after 8 tries.  Runs to completion; never killed.
cd /root/repo
LOG=benches/logs/r5
for i in $(seq 1 8); do
  echo "=== probe attempt $i $(date) ===" >> $LOG/session4.log
  if python benches/tpu_health_probe.py > $LOG/health4.json 2>> $LOG/session4.log; then
    cat $LOG/health4.json >> $LOG/session4.log
    echo "=== deep selftest $(date) ===" >> $LOG/session4.log
    python -m webgpufft_tpu.selftest --deep >> $LOG/session4.log 2>&1
    echo "=== suite (post-fix re-run) $(date) ===" >> $LOG/session4.log
    python benches/suite.py > $LOG/suite_r5b.jsonl 2>> $LOG/session4.log
    echo "=== bench.py $(date) ===" >> $LOG/session4.log
    python bench.py >> $LOG/session4.log 2>&1
    echo "=== r33 chunk A/B $(date) ===" >> $LOG/session4.log
    python benches/r33_c2c_chunk_ab.py > $LOG/r33.log 2>&1
    echo "=== session4 done $(date) ===" >> $LOG/session4.log
    touch $LOG/session4.done
    exit 0
  fi
  cat $LOG/health4.json >> $LOG/session4.log 2>/dev/null
  sleep 600
done
echo "=== session4 gave up (tunnel down) $(date) ===" >> $LOG/session4.log
touch $LOG/session4.gaveup
