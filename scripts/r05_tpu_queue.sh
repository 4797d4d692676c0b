#!/bin/bash
# Resilient r05 TPU job queue: the axon tunnel cycles between alive and
# dead (observed all round), so each job is guarded by a fresh probe and
# the queue retries until every artifact exists or the deadline passes.
# Artifacts double as done-markers, so the queue is restartable.
cd /root/repo || exit 1
export PYTHONPATH=.:/root/.axon_site
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-10800} ))
LOG=/tmp/queue_r05.log

probe() {
    timeout 200 python scripts/probe_tpu.py --budget 150 >/dev/null 2>&1
}

run_job() {  # $1 marker file, $2... command
    local marker=$1; shift
    [ -e "$marker" ] && return 0
    echo "[queue $(date +%H:%M:%S)] probing for: $marker" >>"$LOG"
    if ! probe; then
        echo "[queue $(date +%H:%M:%S)] tunnel dead" >>"$LOG"
        return 1
    fi
    echo "[queue $(date +%H:%M:%S)] running: $*" >>"$LOG"
    "$@" >>"$LOG" 2>&1
    local rc=$?
    echo "[queue $(date +%H:%M:%S)] rc=$rc for $marker" >>"$LOG"
    return 0
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    run_job results/exp_link_r05.txt \
        bash -c 'timeout 1500 python -u scripts/exp_link_r04.py \
                 | grep -v WARNING > results/exp_link_r05.txt'
    run_job results/exp_dec_r05.txt \
        bash -c 'timeout 2400 python -u scripts/exp_dec_r05.py \
                 | grep -v WARNING > results/exp_dec_r05.txt'
    run_job results/bench_720p_r05.json \
        timeout 3600 python -u scripts/bench_720p.py
    run_job results/bench_train_r05.json \
        env E2FGVI_TRAIN_BENCH_OUT=results/bench_train_r05.json \
        timeout 3600 python -u bench_train.py
    run_job results/bench_delta_r05.json \
        bash -c 'timeout 2400 python -u bench.py | tail -1 \
                 > results/bench_delta_r05.json'
    run_job results/.fastpath_r05_ok \
        bash -c 'timeout 3600 python -m pytest tests/test_fastpath_tpu.py -m "" \
                 -x -q && touch results/.fastpath_r05_ok'
    pend=0
    for m in results/exp_link_r05.txt results/exp_dec_r05.txt \
             results/bench_720p_r05.json results/bench_train_r05.json \
             results/bench_delta_r05.json results/.fastpath_r05_ok; do
        [ -e "$m" ] || pend=$((pend + 1))
    done
    [ "$pend" -eq 0 ] && { echo "[queue] all done" >>"$LOG"; exit 0; }
    echo "[queue $(date +%H:%M:%S)] $pend pending, sleeping" >>"$LOG"
    sleep 150
done
echo "[queue] deadline reached" >>"$LOG"
