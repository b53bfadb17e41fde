"""sf1 edge-build A/B feeding the REAL triangle_count operator
(regime gate picks wedge at this scale). Interleaved, median-of-3.

Usage: python tools/decompose_q105_sf1edge.py [sf1_dir]"""
import os, statistics, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
from decompose_q105b import _edges_selfjoin, _edges_grouped
from dropbox_duckdb_playground_spark.operators.components import triangle_count
from dropbox_duckdb_playground_spark.session import get_spark, quiesce

SF1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "testdata_sf1")
spark = get_spark("q105_sf1_edge_ab")
FORMS = {"selfjoin": _edges_selfjoin, "grouped": _edges_grouped}
def run(fn, sf):
    return triangle_count(fn(spark, sf)).collect()[0]["n_triangles"]
# shape warm + one untimed sf1 warm rep per form (VOLATILE_REPS doctrine)
for fn in FORMS.values():
    run(fn, "/root/testdata/sf0.001"); quiesce(spark)
for fn in FORMS.values():
    run(fn, SF1); quiesce(spark)
acc = {k: [] for k in FORMS}; counts = set()
for i in range(3):
    for label, fn in FORMS.items():
        t0 = time.time(); n = run(fn, SF1); dt = round(time.time()-t0, 3)
        acc[label].append(dt); counts.add(n)
        print(f"rep{i} {label}: {dt}s n={n}", flush=True); quiesce(spark)
assert len(counts) == 1, counts
meds = {k: statistics.median(v) for k, v in acc.items()}
for k, v in meds.items():
    print(f"MEDIAN {k}: {v:.3f}s", flush=True)
