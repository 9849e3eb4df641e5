#!/bin/bash
# Round-4 chip queue: resume KIBA to early stop, then Metz, in auto-retrying
# bounded chunks (train_state.msgpack makes each chunk a lossless resume).
# One TPU process at a time; each chunk under timeout; exit code 124 = chunk
# timed out (keep going), 0 = fit() ran to early stop / budget and wrote
# "Test metrics".
set -u
cd /root/repo
PY=/opt/venv/bin/python

run_until_done() {
  local name=$1 dataset=$2; shift 2
  local extra=("$@")
  for i in $(seq 1 16); do
    echo "[$(date +%H:%M:%S)] chunk $i starting" >> "runs/$name/log.txt"
    timeout 3300 $PY train_model.py --dataset "$dataset" --seed 9 \
      --out-folder "runs/$name" --data-root /root/reference/data \
      --structures-dir "data/structures_$dataset" --synthetic-structures \
      --n-epochs 2000 --resume "${extra[@]}" >> "runs/$name/log.txt" 2>&1
    rc=$?
    echo "[$(date +%H:%M:%S)] chunk $i exit $rc" >> "runs/$name/log.txt"
    if [ $rc -eq 0 ]; then
      echo "$name DONE"
      return 0
    fi
    if [ $rc -ne 124 ]; then
      # real failure: retry once more after a pause, then give up
      sleep 10
    fi
  done
  echo "$name EXHAUSTED RETRIES"
  return 1
}

run_until_done kiba_short kiba
run_until_done metz_short metz --protein-convs 3 --molecule-convs 3
echo ALL DONE
