"""Scratch: prototype the unrolled-PQ DuckDB CTE against a pure-numpy
replay of similarity._pq_train + product_quantize encoding, no Spark.
"""
import sys

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
M, K, ITERS, SAMPLE, DIMS = 8, 16, 8, 256, 64
SUB = DIMS // M


def d2_expr(a: str, b: str) -> str:
    return " + ".join(f"({a}[{d}]-{b}[{d}])*({a}[{d}]-{b}[{d}])"
                      for d in range(1, SUB + 1))


def pq_sql() -> str:
    d2_tb = d2_expr("s.svec", "b.svec")
    d2_vb = d2_expr("v.svec", "b.svec")
    its = []
    for it in range(1, ITERS + 1):
        its.append(f"""
pa{it} AS (
  SELECT j, rn, svec, code FROM (
    SELECT s.j, s.rn, s.svec, b.code,
           row_number() OVER (PARTITION BY s.rn, s.j
                              ORDER BY {d2_tb}, b.code) AS o
    FROM ptsub s JOIN pb{it - 1} b USING (j)) WHERE o = 1),
pu{it} AS (
  SELECT j, code, dd.d AS dim, round(avg(svec[dd.d]), 6) AS c
  FROM pa{it}, (SELECT unnest(range(1, {SUB + 1})) AS d) dd
  GROUP BY j, code, dd.d),
pu{it}l AS (SELECT j, code, list(c ORDER BY dim) AS svec
            FROM pu{it} GROUP BY j, code),
pb{it} AS (SELECT b.j, b.code, coalesce(u.svec, b.svec) AS svec
           FROM pb{it - 1} b LEFT JOIN pu{it}l u USING (j, code))""")
    return f"""
WITH vecs AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS base
  FROM '{SF}/embeddings.parquet'),
pjs AS (SELECT unnest(range(0, {M})) AS j),
pallsub AS (
  SELECT vec_id, j, base[(j*{SUB}+1):(j*{SUB}+{SUB})] AS svec
  FROM vecs, pjs),
psamp AS (
  SELECT vec_id, base, row_number() OVER (ORDER BY vec_id) - 1 AS rn
  FROM vecs ORDER BY vec_id LIMIT {SAMPLE}),
ptsub AS (
  SELECT rn, j, base[(j*{SUB}+1):(j*{SUB}+{SUB})] AS svec
  FROM psamp, pjs),
pn AS (SELECT count(*) AS n FROM psamp),
pidx AS (
  SELECT code,
         CASE WHEN {K} = 1 OR code = {K - 1} THEN n - 1
              ELSE CAST(floor(code * ((n - 1)
                        / CAST({K - 1} AS DOUBLE))) AS BIGINT) END AS rn
  FROM (SELECT unnest(range(0, {K})) AS code), pn),
pb0 AS (SELECT s.j, i.code, s.svec
        FROM pidx i JOIN ptsub s USING (rn)),{",".join(its)},
pcodes AS (
  SELECT vec_id, j, code, d2 FROM (
    SELECT v.vec_id, v.j, b.code, {d2_vb} AS d2,
           row_number() OVER (PARTITION BY v.vec_id, v.j
                              ORDER BY {d2_vb}, b.code) AS o
    FROM pallsub v JOIN pb{ITERS} b USING (j)) WHERE o = 1)
SELECT e.vec_id, e.label, c.codes, c.recon_mse
FROM (SELECT vec_id, list(code ORDER BY j) AS codes,
             round(sum(d2) / {DIMS}, 8) AS recon_mse
      FROM pcodes GROUP BY vec_id) c
JOIN vecs e USING (vec_id)
ORDER BY vec_id
"""


def numpy_ref():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    x = np.array([r[2] for r in rows], dtype=np.float64)
    xs_t = x[:min(SAMPLE, len(x))]
    # _pq_train replay (with the round-6 update)
    books = []
    for j in range(M):
        xs = xs_t[:, j * SUB:(j + 1) * SUB]
        idx = np.linspace(0, len(xs) - 1, K).astype(int)
        c = xs[idx].copy()
        for _ in range(ITERS):
            dd = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = dd.argmin(axis=1)
            for code in range(K):
                mask = assign == code
                if mask.any():
                    c[code] = np.round(xs[mask].mean(axis=0), 6)
        books.append(c)
    books = np.stack(books)
    codes = np.empty((len(x), M), dtype=np.int64)
    recon = np.empty_like(x)
    for j in range(M):
        xs = x[:, j * SUB:(j + 1) * SUB]
        dd = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = dd.argmin(axis=1)
        recon[:, j * SUB:(j + 1) * SUB] = books[j][codes[:, j]]
    mse = np.round(((x - recon) ** 2).mean(axis=1), 8)
    return ids, labels, codes, mse


def main():
    ids, labels, codes, mse = numpy_ref()
    con = duckdb.connect()
    out = con.execute(pq_sql()).fetchall()
    assert len(out) == len(ids), (len(out), len(ids))
    n_code_mismatch = n_mse_mismatch = 0
    for i, row in enumerate(out):
        assert row[0] == ids[i]
        if list(row[2]) != list(codes[i]):
            n_code_mismatch += 1
            if n_code_mismatch <= 3:
                print("code mismatch", ids[i], list(row[2]), list(codes[i]))
        if row[3] != mse[i]:
            n_mse_mismatch += 1
            if n_mse_mismatch <= 3:
                print("mse mismatch", ids[i], row[3], mse[i])
    print(f"{SF}: rows={len(ids)} code_mismatch={n_code_mismatch} "
          f"mse_mismatch={n_mse_mismatch}")


if __name__ == "__main__":
    main()
