#!/bin/sh
# Binary-search the minimal failing prefix of the crashing canonical block.
# Known: offset 32MB, len 8388608 passes; len 16777216 fails (INTERNAL).
cd /root/repo
LO=8388608
HI=16777216
while [ $((HI - LO)) -gt 65536 ]; do
  MID=$(( (LO + HI) / 2 ))
  MID=$(( MID / 65536 * 65536 ))
  echo "=== try len=$MID (lo=$LO hi=$HI)" >> /tmp/bisect.log
  if timeout 420 python tools/probe_canonical_step.py --stage 1 \
       --offset-mb 32 --len $MID >> /tmp/bisect.log 2>&1; then
    echo "PASS $MID" >> /tmp/bisect.log
    LO=$MID
  else
    echo "FAIL $MID" >> /tmp/bisect.log
    HI=$MID
    sleep 120   # let the wedged tunnel recover
  fi
done
echo "RESULT: minimal failing prefix in ($LO, $HI]" >> /tmp/bisect.log
