#!/bin/bash
# Probe-qualified N->4N scaling evidence (BENCH/BASELINE.md north rule).
#
# Each pair = local[2] leg + local[8] leg back-to-back over the SAME
# materialized 2M-page parquet table, with a single-threaded pure-CPU probe
# (tools/cpu_probe.py) running concurrently. The probe is calibrated solo
# before the first pair; a pair QUALIFIES only if the probe's median
# iteration time during its window deviated <= 10% from calibration —
# windows where the hypervisor deschedules the box are discarded instead of
# cherry-picked around. The reported headline is the MEDIAN efficiency of
# qualified pairs (>= 3 required).
#
# usage: scaling_probe_bench.sh <tag> [npairs]   (pages table must exist:
#        sbt "runMain graft.synth.PagesWrite 2000000 /tmp/graft_pages_2m")
set -e
cd "$(dirname "$0")/.."
TAG=${1:-r4}
PAIRS=${2:-5}
JAR=target/scala-2.13/crawler_system_v3_json_ldspark_2.13-0.1.0.jar
PAGES=${PAGES:-/tmp/graft_pages_2m}
OUT=BENCH
mkdir -p "$OUT"

[ -f "$JAR" ] || sbt -batch package >/dev/null

CAL_FILE=/tmp/probe_cal_$TAG.txt
rm -f "$CAL_FILE"
python3 tools/cpu_probe.py 12 "$CAL_FILE"
CAL=$(python3 -c "import statistics,sys;print(statistics.median([float(l) for l in open(sys.argv[1])]))" "$CAL_FILE")
echo "probe calibration: ${CAL}s/iter"

for i in $(seq 1 "$PAIRS"); do
  PF=/tmp/probe_${TAG}_p${i}.txt
  rm -f "$PF"
  python3 tools/cpu_probe.py 0 "$PF" &
  PROBE_PID=$!
  for c in 2 8; do
    rm -rf "/tmp/graft_scale2m_$c"
    /opt/spark/bin/spark-submit --master "local[$c]" --driver-memory 40g \
      --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=$c \
      --class graft.jobs.CrawlMain "$JAR" \
      --pages 2000000 --pagesDir "$PAGES" --state "/tmp/graft_scale2m_$c" \
      --rounds 3 --roundSeconds 400000 --cpus "$c" 2>/dev/null \
      | grep -F '"metric"' > "$OUT/crawl2m_${TAG}p${i}_${c}cores.json"
  done
  kill "$PROBE_PID" 2>/dev/null || true
  wait "$PROBE_PID" 2>/dev/null || true
  python3 - "$OUT" "$TAG" "$i" "$CAL" "$PF" <<'EOF'
import json, sys
out, tag, i, cal, pf = sys.argv[1], sys.argv[2], sys.argv[3], float(sys.argv[4]), sys.argv[5]
v2 = json.load(open(f"{out}/crawl2m_{tag}p{i}_2cores.json"))["value"]
v8 = json.load(open(f"{out}/crawl2m_{tag}p{i}_8cores.json"))["value"]
samples = sorted(float(l) for l in open(pf))
med = samples[len(samples) // 2]
dev = med / cal - 1.0
print(f"pair {i}: local[2] {v2:.0f} -> local[8] {v8:.0f} urls/s, "
      f"eff {(v8/v2)/4:.3f}, probe median {med:.3f}s (dev {dev:+.1%}) "
      f"{'QUALIFIED' if dev <= 0.10 else 'DISCARDED'}")
EOF
done

python3 - "$OUT" "$TAG" "$PAIRS" "$CAL" <<'EOF'
import json, statistics, sys
out, tag, pairs, cal = sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4])
rows = []
for i in range(1, pairs + 1):
    try:
        v2 = json.load(open(f"{out}/crawl2m_{tag}p{i}_2cores.json"))["value"]
        v8 = json.load(open(f"{out}/crawl2m_{tag}p{i}_8cores.json"))["value"]
        samples = sorted(float(l) for l in open(f"/tmp/probe_{tag}_p{i}.txt"))
        med = samples[len(samples) // 2]
    except (FileNotFoundError, json.JSONDecodeError):
        continue
    rows.append({"pair": i, "v2": v2, "v8": v8, "eff": (v8 / v2) / 4,
                 "probe_median_s": med, "probe_dev": med / cal - 1.0,
                 "qualified": med / cal - 1.0 <= 0.10})
qual = [r["eff"] for r in rows if r["qualified"]]
summary = {"tag": tag, "probe_calibration_s": cal, "pairs": rows,
           "qualified": len(qual),
           "median_qualified_eff": statistics.median(qual) if qual else None}
json.dump(summary, open(f"{out}/scaling_{tag}_summary.json", "w"), indent=1)
print(json.dumps(summary, indent=1))
EOF
