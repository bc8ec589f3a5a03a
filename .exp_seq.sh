#!/bin/bash
cd /root/repo
for args in "full 1" "noread 1" "nogather 1" "full 4"; do
  timeout 580 python -u .exp_break.py $args 2>&1 | grep -v "WARNING\|cpu_aot_loader\|^E08"
done
echo ALLDONE
