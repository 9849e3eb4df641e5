#!/bin/bash
# Round-5 chip master: final re-profile of the shipping step + bench
# confirmation, then Metz chunks until the protocol's 200-stale early stop
# (VERDICT r05 item 2 — the cheapest unfinished headline), then KIBA
# continuation with the remaining time, finishing resumes for both so test
# metrics are recorded at best-val. Every chunk timeout is clipped so
# nothing holds the chip past HARD_END (driver runs bench.py at round end).
set -u
cd /root/repo
PY=/opt/venv/bin/python

METZ_CUTOFF=$(date -d "15:00" +%s)
HARD_END=$(date -d "16:40" +%s)

left_until() { echo $(( $1 - $(date +%s) )); }

chunk() {  # chunk <name> <dataset> <max_secs> [extra...]
  local name=$1 dataset=$2 secs=$3; shift 3
  timeout "$secs" $PY train_model.py --dataset "$dataset" --seed 9 \
    --out-folder "runs/$name" --data-root /root/reference/data \
    --structures-dir "data/structures_$dataset" --synthetic-structures \
    --n-epochs 2000 --resume "$@" >> "runs/$name/log.txt" 2>&1
}

echo "[$(date +%H:%M:%S)] op_table (final shipping config)"
timeout 1500 $PY scripts/op_table.py PROFILE_r5.md > docs/bench/op_table_r5_final.out 2>&1
echo "op_table exit $?"

echo "[$(date +%H:%M:%S)] bench confirmation"
timeout 700 $PY bench.py > docs/bench/bench_r5_mid.json 2>&1
echo "bench exit $?"

metz_done=0
for i in $(seq 1 16); do
  t=$(left_until $METZ_CUTOFF); [ $t -gt 3300 ] && t=3300
  [ $t -lt 600 ] && break
  echo "[$(date +%H:%M:%S)] metz chunk $i starting (${t}s)" >> runs/metz_short/log.txt
  chunk metz_short metz $t --protein-convs 3 --molecule-convs 3
  rc=$?
  echo "[$(date +%H:%M:%S)] metz chunk $i exit $rc" >> runs/metz_short/log.txt
  if [ $rc -eq 0 ]; then metz_done=1; echo "metz EARLY-STOPPED/DONE"; break; fi
  [ $rc -ne 124 ] && sleep 10
done
if [ $metz_done -eq 0 ]; then
  echo "[$(date +%H:%M:%S)] metz finishing resume (cutoff)" >> runs/metz_short/log.txt
  timeout 900 $PY train_model.py --dataset metz --seed 9 \
    --out-folder runs/metz_short --data-root /root/reference/data \
    --structures-dir data/structures_metz --synthetic-structures \
    --n-epochs 1 --resume --protein-convs 3 --molecule-convs 3 \
    >> runs/metz_short/log.txt 2>&1
  echo "metz FINISHED-BOUNDED exit $?"
fi

kiba_done=0
KIBA_CUTOFF=$(( HARD_END - 1500 ))
for i in $(seq 1 16); do
  t=$(left_until $KIBA_CUTOFF); [ $t -gt 3300 ] && t=3300
  [ $t -lt 600 ] && break
  echo "[$(date +%H:%M:%S)] kiba chunk $i starting (${t}s)" >> runs/kiba_short/log.txt
  chunk kiba_short kiba $t
  rc=$?
  echo "[$(date +%H:%M:%S)] kiba chunk $i exit $rc" >> runs/kiba_short/log.txt
  if [ $rc -eq 0 ]; then kiba_done=1; echo "kiba EARLY-STOPPED/DONE"; break; fi
  [ $rc -ne 124 ] && sleep 10
done
if [ $kiba_done -eq 0 ] && [ "$(left_until $HARD_END)" -gt 900 ]; then
  echo "[$(date +%H:%M:%S)] kiba finishing resume (budget cutoff)" >> runs/kiba_short/log.txt
  timeout 1400 $PY train_model.py --dataset kiba --seed 9 \
    --out-folder runs/kiba_short --data-root /root/reference/data \
    --structures-dir data/structures_kiba --synthetic-structures \
    --n-epochs 1 --resume >> runs/kiba_short/log.txt 2>&1
  echo "kiba FINISHED-BOUNDED exit $?"
fi
echo "ALL DONE $(date +%H:%M:%S)"
