#!/bin/bash
# Round-4 chip interlude (run AFTER the KIBA queue is stopped): per-op
# profile table, attention A/B, Davis fine-tune from the reference .pt,
# then resume the Metz convergence loop. One TPU process at a time.
set -u
cd /root/repo
PY=/opt/venv/bin/python

echo "[$(date +%H:%M:%S)] op_table"
timeout 1200 $PY scripts/op_table.py PROFILE_r4.md > op_table_r4.out 2>&1
echo "op_table exit $?"

echo "[$(date +%H:%M:%S)] attention bench"
timeout 2400 $PY scripts/bench_attention_kiba.py > bench_attention_r4.out 2>&1
echo "attention exit $?"

echo "[$(date +%H:%M:%S)] davis fine-tune from reference .pt (bounded)"
timeout 1800 $PY train_model.py --dataset davis --seed 9 \
  --out-folder runs/davis_finetune_ref --data-root /root/reference/data \
  --structures-dir data/structures_davis --synthetic-structures \
  --n-epochs 30 \
  --checkpoint /root/reference/pretrained_model_downstream \
  > runs_davis_finetune.out 2>&1
echo "finetune exit $?"

echo "[$(date +%H:%M:%S)] metz resume loop"
for i in $(seq 1 16); do
  echo "[$(date +%H:%M:%S)] metz chunk $i starting" >> runs/metz_short/log.txt
  timeout 3300 $PY train_model.py --dataset metz --seed 9 \
    --out-folder runs/metz_short --data-root /root/reference/data \
    --structures-dir data/structures_metz --synthetic-structures \
    --n-epochs 2000 --resume >> runs/metz_short/log.txt 2>&1
  rc=$?
  echo "[$(date +%H:%M:%S)] metz chunk $i exit $rc" >> runs/metz_short/log.txt
  if [ $rc -eq 0 ]; then echo "metz DONE"; break; fi
done
echo ALL DONE
