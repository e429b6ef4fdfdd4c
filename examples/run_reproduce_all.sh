#!/bin/sh
# Per-dataset reproduction runs (n=5) with per-run JSON + a merged table.
# Run from the repo root on the TPU host. Each dataset gets its own budget
# so one slow config cannot starve the rest; partial results persist.
cd "$(dirname "$0")/.."
mkdir -p /tmp/repro
for ds in Cora Computers Photo ogbn-arxiv Citeseer CoauthorCS; do
  echo "=== $ds ==="
  timeout 1500 python -u reproduce.py --reps 5 --datasets "$ds" \
    --out "/tmp/repro/$ds.json" || echo "$ds: TIMED OUT"
done
# Pubmed's tuned budget is 600 epochs x 5 reps of adjoint dopri5 — cap it
# and record the cap in the JSON (the 'epochs' field)
echo "=== Pubmed (capped 150 epochs) ==="
timeout 1800 python -u reproduce.py --reps 5 --datasets Pubmed \
  --epochs 150 --out /tmp/repro/Pubmed.json || echo "Pubmed: TIMED OUT"
python - <<'EOF'
import glob, json
rows = []
for f in sorted(glob.glob("/tmp/repro/*.json")):
    rows.extend(json.load(open(f)))
json.dump(rows, open("reproduce_results.json", "w"), indent=2)
print("merged", len(rows), "rows -> reproduce_results.json")
EOF
