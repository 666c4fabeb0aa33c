#!/bin/bash
# r5 TPU session 2: untangle A/B -> transpose A/B -> corrected bf16 rows
cd /root/repo
echo "=== r23 untangle $(date) ==="
python benches/r23_untangle_fuse.py 2>&1 | tee benches/logs/r5/r23.log
echo "=== r24 transpose $(date) ==="
python benches/r24_transpose_ab.py 2>&1 | tee benches/logs/r5/r24.log
echo "=== r25 bf16 $(date) ==="
python benches/r25_bf16_rows.py 2>&1 | tee benches/logs/r5/r25.log
echo "=== session2 done $(date) ==="
echo "=== r26 pallas $(date) ==="
python benches/r26_pallas_endgame.py 2>&1 | tee benches/logs/r5/r26.log
echo "=== session2 really done $(date) ==="
echo "=== r27 attrib $(date) ==="
python benches/r27_headline_attrib.py 2>&1 | tee benches/logs/r5/r27.log
echo "=== session2 fully done $(date) ==="
