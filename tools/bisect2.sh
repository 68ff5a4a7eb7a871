#!/bin/sh
cd /root/repo
LO=15007744
HI=15073280
while [ $((HI - LO)) -gt 256 ]; do
  MID=$(( (LO + HI) / 2 ))
  echo "=== try len=$MID (lo=$LO hi=$HI)" >> /tmp/bisect2.log
  if timeout 420 python tools/probe_canonical_step.py --stage 1 \
       --offset-mb 32 --len $MID >> /tmp/bisect2.log 2>&1; then
    echo "PASS $MID" >> /tmp/bisect2.log
    LO=$MID
  else
    echo "FAIL $MID" >> /tmp/bisect2.log
    HI=$MID
    sleep 100
  fi
done
echo "RESULT: ($LO, $HI]" >> /tmp/bisect2.log
