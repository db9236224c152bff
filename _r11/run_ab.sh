#!/bin/bash
# Interleaved A/B: base (= inherited tree snapshot /root/base_r11, the
# r11 bench baseline) vs head (= /root/repo working tree), 3 pairs,
# min-of-3 per side via tools/ab_compare.py.  Runs serialized on an
# otherwise idle machine.
set -e
cd /root/repo
for i in 1 2 3; do
  (cd /root/base_r11 && python bench.py --out /root/repo/_r11/ab_base_$i.json \
     > /root/repo/_r11/ab_base_$i.stdout 2>&1)
  echo "base $i done: $(python -c "import json;print(json.load(open('_r11/ab_base_$i.json'))['value'])")"
  python bench.py --out /root/repo/_r11/ab_head_$i.json \
     > /root/repo/_r11/ab_head_$i.stdout 2>&1
  echo "head $i done: $(python -c "import json;print(json.load(open('_r11/ab_head_$i.json'))['value'])")"
done
python tools/ab_compare.py \
  _r11/ab_base_1.json _r11/ab_head_1.json \
  _r11/ab_base_2.json _r11/ab_head_2.json \
  _r11/ab_base_3.json _r11/ab_head_3.json | tee _r11/ab_summary.txt
