#!/bin/bash
# r5 TPU session 6: bf16-storage flagship datapoint (r34) after session 5
# completes.  Runs to completion; never killed (CLAUDE.md TPU rules).
cd /root/repo
LOG=benches/logs/r5
for i in $(seq 1 30); do
  [ -f $LOG/session5.done ] && break
  sleep 240
done
echo "=== session6 start $(date) ===" >> $LOG/session6.log
if python benches/tpu_health_probe.py > $LOG/health6.json 2>> $LOG/session6.log; then
  cat $LOG/health6.json >> $LOG/session6.log
  echo "=== r34 bf16 flagship $(date) ===" >> $LOG/session6.log
  python benches/r34_bf16_flagship.py > $LOG/r34.log 2>&1
  echo "=== session6 done $(date) ===" >> $LOG/session6.log
  touch $LOG/session6.done
else
  echo "=== session6 probe failed $(date) ===" >> $LOG/session6.log
fi
