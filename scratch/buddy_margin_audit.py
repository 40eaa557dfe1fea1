"""Rule-23 margin audit for the buddy_check position rollup.

The rollup computes buddy mean/variance from summed per-position moments
(sum v, sum v^2) instead of Spark's streaming avg/var_pop over pair rows.
Both are reassociations of the same IEEE sums (Spark's partial aggregation
order is already nondeterministic), so the only way the flag could differ
from the DuckDB oracle is a comparison sitting within ~1e-12 relative of
its boundary. This script computes, per row at the correctness SFs, the
distance of every decision quantity from its boundary and prints the
minima. Margins >= 1e-6 are safe (CLAUDE.md rule 23).

Boundaries audited (harness params: num_min=5, threshold=2.0, min_std=0.1):
* |value - mean| / std_adj  vs  threshold   (the flag comparison)
* sqrt(var + var/n)         vs  min_std     (the greatest() branch)
* n                         vs  num_min     (integer — exact, skipped)
"""

import duckdb

RADIUS = 2500.0
NUM_MIN = 5
THRESHOLD = 2.0
MIN_STD = 0.1

Q = """
WITH geo AS (
  SELECT c_custkey AS id,
         50.0 + (c_custkey % 40) * 0.01 AS lat,
         10.0 + (CAST(floor(c_custkey / 40.0) AS BIGINT) % 40) * 0.01 AS lon,
         c_acctbal / 100.0 AS value
  FROM read_parquet('{dir}/customer.parquet')
),
pts AS (
  SELECT *,
         cos(radians(lat)) * cos(radians(lon)) * 6370000.0 AS x,
         cos(radians(lat)) * sin(radians(lon)) * 6370000.0 AS y,
         sin(radians(lat)) * 6370000.0 AS z
  FROM geo
),
pairs AS (
  SELECT a.id AS id, b.value AS n_value
  FROM pts a JOIN pts b
    ON a.id <> b.id
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) + (a.z-b.z)*(a.z-b.z)
       <= {r} * {r}
   AND NOT (a.x = b.x AND a.y = b.y AND a.z = b.z)
),
stats AS (
  SELECT id, count(*) AS n, avg(n_value) AS mean, var_pop(n_value) AS var
  FROM pairs GROUP BY id
),
m AS (
  SELECT g.id, s.n,
         abs(g.value - s.mean) AS dev,
         greatest(sqrt(s.var + s.var / s.n), {min_std}) AS std_adj,
         sqrt(s.var + s.var / s.n) AS raw_std
  FROM geo g JOIN stats s ON g.id = s.id
  WHERE s.n >= {num_min}
)
SELECT
  min(abs(dev / std_adj - {thr}))                          AS min_flag_margin,
  min(abs(raw_std - {min_std}))                            AS min_std_margin,
  count(*) AS n_rows
FROM m
"""

for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    row = duckdb.connect().execute(
        Q.format(dir=d, r=RADIUS, num_min=NUM_MIN, thr=THRESHOLD, min_std=MIN_STD)
    ).fetchone()
    print(f"{d}: min |dev/std - thr| = {row[0]:.3e}  "
          f"min |std - min_std| = {row[1]:.3e}  rows = {row[2]}")
