#!/usr/bin/env bash
# Jellyfish parity check: the final sharkmer-tpu histogram must be
# bit-identical to `jellyfish count -C` + `jellyfish histo` on the same
# FASTQ (the reference's external-tool oracle,
# scripts/compare_jellyfish.sh).
#
# Usage: scripts/compare_jellyfish.sh READS.fastq[.gz] [K] [OUTDIR]
set -euo pipefail

READS=${1:?usage: compare_jellyfish.sh READS.fastq[.gz] [K] [OUTDIR]}
K=${2:-21}
OUT=${3:-$(mktemp -d)}
HISTO_MAX=10000

command -v jellyfish >/dev/null || {
    echo "jellyfish not found on PATH; install it to run this parity check" >&2
    exit 2
}

mkdir -p "$OUT"

echo "== sharkmer-tpu count (k=$K, chunks=1)"
/usr/bin/time -v python -m sharkmer_tpu "$READS" -s parity -k "$K" \
    --chunks 1 --histo-max "$HISTO_MAX" -o "$OUT" 2> "$OUT/sharkmer.time" || {
    cat "$OUT/sharkmer.time" >&2; exit 1; }
grep -E "Elapsed|Maximum resident" "$OUT/sharkmer.time" || true

echo "== jellyfish count -C (canonical)"
CAT=cat
case "$READS" in *.gz) CAT="zcat";; esac
/usr/bin/time -v bash -c "$CAT '$READS' | jellyfish count -C -m $K -s 100M -t 8 -o '$OUT/jf.jf' /dev/stdin" \
    2> "$OUT/jellyfish.time"
grep -E "Elapsed|Maximum resident" "$OUT/jellyfish.time" || true
jellyfish histo -h "$HISTO_MAX" "$OUT/jf.jf" > "$OUT/jf.histo"

# normalize: sharkmer writes count\tfrequency rows 1..histo_max+1 with a
# comment+header; jellyfish writes "count frequency" space-separated and
# omits zero rows. Compare non-zero rows only.
awk 'NR>2 && $2 != 0 { print $1, $2 }' "$OUT/parity.final.histo" > "$OUT/shark.norm"
awk '$2 != 0 { print $1, $2 }' "$OUT/jf.histo" > "$OUT/jf.norm"

if diff -q "$OUT/shark.norm" "$OUT/jf.norm" > /dev/null; then
    echo "PASS: histograms are identical"
else
    echo "FAIL: histograms differ" >&2
    diff "$OUT/shark.norm" "$OUT/jf.norm" | head -20 >&2
    exit 1
fi
