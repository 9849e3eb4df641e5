#!/bin/bash
# Round-5 (late) chip continuation: push KIBA from epoch ~1343 toward the
# protocol's 200-stale early stop (best val currently epoch 1272 -> the stop
# fires at ~1472 if val does not improve). Bounded chunks + finishing resume
# so test metrics at best-val are recorded whatever happens; nothing holds
# the chip past HARD_END.
set -u
cd /root/repo
PY=/opt/venv/bin/python

KIBA_CUTOFF=$(date -d "18:47" +%s)
HARD_END=$(date -d "19:02" +%s)

left_until() { echo $(( $1 - $(date +%s) )); }

kiba_done=0
for i in $(seq 1 8); do
  t=$(left_until $KIBA_CUTOFF); [ $t -gt 3300 ] && t=3300
  [ $t -lt 420 ] && break
  echo "[$(date +%H:%M:%S)] kiba r5b chunk $i starting (${t}s)" >> runs/kiba_short/log.txt
  timeout "$t" $PY train_model.py --dataset kiba --seed 9 \
    --out-folder runs/kiba_short --data-root /root/reference/data \
    --structures-dir data/structures_kiba --synthetic-structures \
    --n-epochs 2000 --resume >> runs/kiba_short/log.txt 2>&1
  rc=$?
  echo "[$(date +%H:%M:%S)] kiba r5b chunk $i exit $rc" >> runs/kiba_short/log.txt
  if [ $rc -eq 0 ]; then kiba_done=1; echo "kiba EARLY-STOPPED/DONE"; break; fi
  [ $rc -ne 124 ] && sleep 10
done
if [ $kiba_done -eq 0 ] && [ "$(left_until $HARD_END)" -gt 420 ]; then
  echo "[$(date +%H:%M:%S)] kiba r5b finishing resume" >> runs/kiba_short/log.txt
  timeout $(( $(left_until $HARD_END) - 30 )) $PY train_model.py --dataset kiba --seed 9 \
    --out-folder runs/kiba_short --data-root /root/reference/data \
    --structures-dir data/structures_kiba --synthetic-structures \
    --n-epochs 1 --resume >> runs/kiba_short/log.txt 2>&1
  echo "kiba r5b FINISHED-BOUNDED exit $?"
fi
echo "ALL DONE $(date +%H:%M:%S)"
