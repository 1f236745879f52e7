#!/bin/bash
# Build the reference biokanga binary (v4.4.2) out-of-tree (no autotools in image).
# Output: /root/repo/refbuild/bin/biokanga and pacbiokanga
# Sources are compiled straight from /root/reference (read-only).
set -e
REF=/root/reference
OUT=/root/repo/refbuild
mkdir -p $OUT/obj/lib $OUT/obj/plplot $OUT/obj/bio $OUT/obj/pb $OUT/bin

CXX=g++
CC=gcc
CXXFLAGS="-O2 -w -fpermissive -std=gnu++03 -DPL_HAVE_MKSTEMP -DPL_HAVE_UNLINK -I$REF/libbiokanga -I$REF/libBKPLPlot -I$REF"
CFLAGS="-O2 -w -I$REF/libbiokanga"

LIBSRC="AlignValidate argtable2 BEDfile BioSeqFile Centroid Conformation ConfSW CSVFile CVS2BED DataPoints Diagnostics Endian ErrorCodes Fasta FeatLoci FilterLoci FilterRefIDs GOAssocs GOTerms HashFile HyperEls GFFFile GTFFile Contaminants MAlignFile Random SimpleRNG RsltsFile sais SAMfile SeqTrans SfxArray SfxArrayV2 Shuffle SmithWaterman NeedlemanWunsch Stats StopWatch Twister Utility ProcRawReads MTqsort bgzf"

build_obj() { # src obj compiler flags
  local src=$1 obj=$2 comp=$3; shift 3
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
    echo "CC $src"
    $comp "$@" -c "$src" -o "$obj" &
    # throttle
    while [ "$(jobs -r | wc -l)" -ge "$(nproc)" ]; do wait -n; done
  fi
}

for s in $LIBSRC; do
  build_obj $REF/libbiokanga/$s.cpp $OUT/obj/lib/$s.o $CXX $CXXFLAGS
done
wait
# sqlite3.c is listed in the reference Makefile.am but absent from the repo;
# link against the system shared library instead (API-compatible).
SQLITE=/lib/x86_64-linux-gnu/libsqlite3.so.0

# libBKPLPlot (all C++ sources)
for f in $REF/libBKPLPlot/*.cpp; do
  [ "$(basename $f)" = BKPlots.cpp ] && continue
  b=$(basename $f .cpp)
  build_obj $f $OUT/obj/plplot/${b}_cpp.o $CXX $CXXFLAGS
done
wait

BIOSRC="biokanga csv2sqlite SimReads Markers SQLiteSummaries SQLiteMarkers SQLiteDE psl2sqlite SQLitePSL kanga Aligner kangade Kangadna FastaNxx kangax genmarkerseq MarkerSeq genDESeq genpseudogenome maploci2features MapLoci2Feat mergeoverlaps MergeReadPairs fastaextract Assemble LocKMers genkmarkers gensnpmarkers kmermarkers MarkerKMers PEScaffold SSRdiscovery FilterSAMAlignments deNovoAssemb ArtefactReduce Scaffolder AlignsBootstrap ReadStats Blitz RemapLoci LocateROI"
for s in $BIOSRC; do
  build_obj $REF/biokanga/$s.cpp $OUT/obj/bio/$s.o $CXX $CXXFLAGS
done
wait

echo "LINK biokanga"
$CXX -O2 -no-pie -o $OUT/bin/biokanga $OUT/obj/bio/*.o $OUT/obj/lib/*.o $OUT/obj/plplot/*.o $REF/libbiokanga/zlib/libz.a $SQLITE -lpthread -ldl -lrt -lm

PBSRC="SQLiteSummaries SSW SWAlign PBAssemb PBECContigs SeqStore PBFilter PacBioUtility pacbiokanga PBErrCorrect MAConsensus AssembGraph MAFKMerDist PBSWService BKSProvider BKSRequester"
for s in $PBSRC; do
  build_obj $REF/pacbiokanga/$s.cpp $OUT/obj/pb/$s.o $CXX $CXXFLAGS
done
wait
echo "LINK pacbiokanga"
$CXX -O2 -no-pie -o $OUT/bin/pacbiokanga $OUT/obj/pb/*.o $OUT/obj/lib/*.o $OUT/obj/plplot/*.o $REF/libbiokanga/zlib/libz.a $SQLITE -lpthread -ldl -lrt -lm
echo DONE
