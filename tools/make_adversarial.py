#!/usr/bin/env python3
"""Build the adversarial differential fixture: a copy of an SF dir with
edge-case rows a REAL corpus contains but the clean generator never
emits — empty documents, single tokens, consecutive spaces, unicode
(NFKC forms, CJK, ligatures), exact-duplicate text, a very long doc,
punctuation-only text, a duplicated embedding, an all-zeros embedding,
a denormal-norm embedding, a NaN-coordinate embedding, a NULL-coordinate
embedding, and a NaN-valued
event.

Round-10 findings from running `graft.Verify <out>` + `tools/compare.py
<out>` on this fixture (all fixed, all 167 green since):
  - one zero-norm embedding crashed every ANN query with ANSI
    DIVIDE_BY_ZERO (→ VectorFns.cosine/cosineSql zero-norm guard);
  - Spark's sequence(1, 0, 16) aborts where DuckDB's generate_series
    is empty (q46 strided sample on the empty doc);
  - DuckDB's array_to_string([], sep) is NULL where Spark's concat_ws
    is '' (BPE wt0 lost the empty word type; q46 empty sample);
  - the q46 oracle sliced 8 CHARS where the engine slices 8 BYTES
    (diverged on the first multibyte doc);
  - one NaN coordinate made Num.fround silently emit 0.0 (Spark's
    floor(double) returns BIGINT; NaN→long casts to 0 with no error
    even under ANSI) → fround is now an all-double pmod pipeline,
    bit-exact vs libm floor over the FULL double domain (NumSpec);
  - the fixed-point kernels (int8 SQ, e3/e4 moments, JL ratios:
    q71/q72/q103/q129/q132/q142) are undefined on non-finite
    coordinates — DuckDB aborts on the ::INT cast where Spark
    silently zeros → finite-vector hygiene filter at each build
    (VectorFns.finiteVec / finiteVecSql), mirrored on both engines.

Usage: python3 tools/make_adversarial.py [src_sf_dir] [dst_dir]
       (defaults: /root/testdata/sf0.001 -> /tmp/sfadv)
"""
import duckdb, os, shutil, glob, sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfadv'

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
con = duckdb.connect()

for p in glob.glob(src + '/*.parquet'):
    name = os.path.basename(p)
    if name not in ('documents.parquet', 'embeddings.parquet',
                    'events.parquet'):
        shutil.copy(p, dst + '/' + name)

# events edge rows: duplicate timestamp (window/order tie), a replayed
# event_id (at-least-once delivery), malformed + empty JSON props, an
# event type outside the known set, an exact hour-boundary timestamp,
# a negative value, ±Inf and NULL values (round 11), a NULL props, and
# a user with exactly one event.
e0 = con.execute(
    f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
u0 = con.execute(
    f"SELECT max(user_id) + 1000 FROM '{src}/events.parquet'").fetchone()[0]
con.execute(f"""
  COPY (
    SELECT * FROM '{src}/events.parquet'
    UNION ALL
    SELECT * FROM (VALUES
      ({e0 + 0}, TIMESTAMP '2024-01-15 07:30:00.123456', {u0}, 'click',  1.0,   '{{"k": 1}}'),
      ({e0 + 1}, TIMESTAMP '2024-01-15 07:30:00.123456', {u0}, 'click',  2.0,   '{{"k": 2}}'),
      ({e0 + 2}, TIMESTAMP '2024-01-15 00:00:00.000000', {u0}, 'purchase', -5.5, '{{"k": 3}}'),
      ({e0 + 3}, TIMESTAMP '2024-01-16 12:00:00.000000', {u0}, 'mystery_type', 0.0, '{{bad json'),
      ({e0 + 4}, TIMESTAMP '2024-01-17 23:59:59.999999', {u0} + 1, 'view', 7.25, '{{}}'),
      ({e0 + 5}, TIMESTAMP '2024-01-18 09:15:30.500000', {u0} + 1, 'click', 'nan'::DOUBLE, '{{"k": 4}}'),
      ({e0 + 6}, TIMESTAMP '2024-01-18 10:00:00.000000', {u0} + 1, 'view',  'infinity'::DOUBLE,  '{{"k": 5}}'),
      ({e0 + 7}, TIMESTAMP '2024-01-18 11:00:00.000000', {u0} + 1, 'view',  '-infinity'::DOUBLE, '{{"k": 6}}'),
      ({e0 + 8}, TIMESTAMP '2024-01-18 12:00:00.000000', {u0} + 1, 'click', NULL::DOUBLE, NULL::VARCHAR)
    ) v(event_id, ts, user_id, event_type, value, props)
    UNION ALL
    SELECT * FROM '{src}/events.parquet' WHERE event_id = 5
    ORDER BY event_id, ts
  ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

dup_text = con.execute(
    f"SELECT text FROM '{src}/documents.parquet' WHERE doc_id=10").fetchone()[0]
long_text = ' '.join(['stream table join merge window sort hash scan'] * 120)
# Fresh ids AFTER the base range — sf dirs differ in row count, and a
# colliding doc_id/vec_id would corrupt key-equality semantics.
d0 = con.execute(
    f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'").fetchone()[0]
v0 = con.execute(
    f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'").fetchone()[0]
adv_docs = [
    (d0 + 0, '', 'en', 'src0'),                          # empty doc
    (d0 + 1, 'spark', 'en', 'src1'),                     # single token
    (d0 + 2, 'fast  fast  double  space', 'es', 'src0'), # consecutive spaces
    (d0 + 3, 'café 北京 ﬁle ＡＢＣ ½ naïve', 'fr', 'src2'),  # unicode / NFKC forms
    (d0 + 4, dup_text, 'en', 'src1'),                    # exact duplicate text
    (d0 + 5, long_text, 'en', 'src0'),                   # very long doc
    (d0 + 6, '!!! ??? ... ---', 'de', 'src2'),           # punctuation only
    (d0 + 7, '   ', 'en', 'src1'),                       # whitespace-only text
    (d0 + 8, ' leading and trailing  ', 'en', 'src2'),   # boundary spaces
    # round 13: a BRAND-NEW source and a BRAND-NEW language carried by
    # one single-token doc — stresses every per-source aggregate
    # (q189's JSD with a 1-token distribution, q134/q141/q166 domain
    # tables gaining a singleton row) and every per-lang quantile
    # (q139/q190 thresholds over a 1-element group).
    (d0 + 9, 'singleton', 'zz', 'srcadv'),
]
vals = ", ".join(
    f"({i}, {t!r}, {l!r}, {s!r}, length({t!r}))" for i, t, l, s in adv_docs)
con.execute(f"""
  COPY (
    SELECT * FROM '{src}/documents.parquet'
    UNION ALL
    SELECT * FROM (VALUES {vals}) v(doc_id, text, lang, source, n_chars)
    ORDER BY doc_id
  ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

con.execute(f"""
  COPY (
    SELECT * FROM '{src}/embeddings.parquet'
    UNION ALL
    SELECT {v0}::BIGINT,
      (SELECT embedding FROM '{src}/embeddings.parquet' WHERE vec_id=10),
      1::INT
    UNION ALL
    SELECT {v0 + 1}::BIGINT, [0.0::FLOAT for i in generate_series(1,64)], 2::INT
    UNION ALL
    SELECT {v0 + 2}::BIGINT, [1e-20::FLOAT for i in generate_series(1,64)], 0::INT
    UNION ALL
    SELECT {v0 + 3}::BIGINT,
      [CASE WHEN i = 7 THEN 'nan'::FLOAT ELSE 0.5::FLOAT END
       for i in generate_series(1,64)], 1::INT
    UNION ALL
    SELECT {v0 + 4}::BIGINT,
      [CASE WHEN i = 11 THEN NULL ELSE 0.25::FLOAT END
       for i in generate_series(1,64)], 2::INT
    ORDER BY vec_id
  ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

nd = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
ne = con.execute(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
print(f"wrote {dst}: documents={nd} embeddings={ne}")
