#!/bin/bash
# Round-4 chip master (phase 2): measurement interlude; KIBA chunks until a
# wall-clock cutoff (early stop if it fires first), then a finishing resume
# (zero-epoch: final checkpoint + test eval with best-val params); Davis
# fine-tune from the reference .pt; Metz chunks with the remaining time.
# Every chunk's timeout is clipped so nothing holds the chip past HARD_END.
set -u
cd /root/repo
PY=/opt/venv/bin/python

KIBA_CUTOFF=$(date -d "06:20" +%s)
HARD_END=$(date -d "08:00" +%s)

chunk() {  # chunk <name> <dataset> <n_epochs> <max_secs> [extra...]
  local name=$1 dataset=$2 eps=$3 secs=$4; shift 4
  timeout "$secs" $PY train_model.py --dataset "$dataset" --seed 9 \
    --out-folder "runs/$name" --data-root /root/reference/data \
    --structures-dir "data/structures_$dataset" --synthetic-structures \
    --n-epochs "$eps" --resume "$@" >> "runs/$name/log.txt" 2>&1
}

left() { echo $(( HARD_END - $(date +%s) )); }

echo "[$(date +%H:%M:%S)] op_table"
timeout 1200 $PY scripts/op_table.py PROFILE_r4.md > op_table_r4.out 2>&1
echo "op_table exit $?"

echo "[$(date +%H:%M:%S)] attention bench"
timeout 2700 $PY scripts/bench_attention_kiba.py > bench_attention_r4.out 2>&1
echo "attention exit $?"

kiba_done=0
for i in $(seq 1 16); do
  [ "$(date +%s)" -ge "$KIBA_CUTOFF" ] && break
  t=$(( KIBA_CUTOFF - $(date +%s) )); [ $t -gt 3300 ] && t=3300
  [ $t -lt 900 ] && break
  echo "[$(date +%H:%M:%S)] kiba chunk $i starting (${t}s)" >> runs/kiba_short/log.txt
  chunk kiba_short kiba 2000 $t
  rc=$?
  echo "[$(date +%H:%M:%S)] kiba chunk $i exit $rc" >> runs/kiba_short/log.txt
  if [ $rc -eq 0 ]; then kiba_done=1; echo "kiba EARLY-STOPPED"; break; fi
  [ $rc -ne 124 ] && sleep 10
done
if [ $kiba_done -eq 0 ]; then
  echo "[$(date +%H:%M:%S)] kiba finishing resume (budget cutoff)" \
    >> runs/kiba_short/log.txt
  chunk kiba_short kiba 1 1500
  echo "kiba FINISHED-BOUNDED exit $?"
fi

echo "[$(date +%H:%M:%S)] davis fine-tune from reference .pt (bounded)"
timeout 1500 $PY train_model.py --dataset davis --seed 9 \
  --out-folder runs/davis_finetune_ref --data-root /root/reference/data \
  --structures-dir data/structures_davis --synthetic-structures \
  --n-epochs 30 \
  --checkpoint /root/reference/pretrained_model_downstream \
  > runs_davis_finetune.out 2>&1
echo "finetune exit $?"

metz_done=0
for i in $(seq 1 16); do
  t=$(( $(left) - 1200 )); [ $t -gt 3300 ] && t=3300
  [ $t -lt 900 ] && break
  echo "[$(date +%H:%M:%S)] metz chunk $i starting (${t}s)" >> runs/metz_short/log.txt
  chunk metz_short metz 2000 $t
  rc=$?
  echo "[$(date +%H:%M:%S)] metz chunk $i exit $rc" >> runs/metz_short/log.txt
  if [ $rc -eq 0 ]; then metz_done=1; echo "metz DONE"; break; fi
  [ $rc -ne 124 ] && sleep 10
done
if [ $metz_done -eq 0 ] && [ "$(left)" -gt 700 ]; then
  echo "[$(date +%H:%M:%S)] metz finishing resume" >> runs/metz_short/log.txt
  chunk metz_short metz 1 600
  echo "metz finishing exit $?"
fi
echo ALL DONE
