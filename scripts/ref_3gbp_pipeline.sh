#!/bin/bash
# Reference-binary 3 Gbp pipeline: genome gen -> simreads PE -> index -> align.
# Produces the reference comparison row for the north-star config
# (BASELINE.json config: 100 bp PE vs 3 Gbp) — VERDICT r2 item 1.
# Run in background; stage timings land in $DIR/stage_times.txt.
set -e
REPO=/root/repo
DIR=${1:-/root/data3g}
BP=${2:-3000000000}
BIN=$REPO/refbuild/bin/biokanga
mkdir -p "$DIR"
cd "$DIR"
T=stage_times.txt
: > $T

stamp() { echo "$1 $(date +%s.%N)" >> $T; }

stamp gen_start
if [ ! -f g.fa ]; then
  python3 $REPO/scripts/gen_genome_fasta.py "$DIR" --bp $BP --seed 31
fi
stamp gen_done

stamp simreads_start
if [ ! -f r1.fa ]; then
  $BIN simreads -m0 -M3 -n 262144 -l 100 -p -j 200 -J 500 -z 0.01 -g3 \
    -i g.fa -o r1.fa -O r2.fa -F sim.log
fi
stamp simreads_done

stamp index_start
if [ ! -f g.sfx ]; then
  /usr/bin/time -v -o index_time.txt \
    $BIN index -i g.fa -o g.sfx -r t -T2 -F idx.log
fi
stamp index_done

stamp align_start
/usr/bin/time -v -o align_time.txt \
  $BIN align -i r1.fa -u r2.fa -U1 -d 100 -D 600 -I g.sfx -o ref3g.sam \
  -M5 -T2 -F aln.log
stamp align_done
echo DONE >> $T
