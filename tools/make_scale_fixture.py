#!/usr/bin/env python3
"""Deterministic scale fixture: replicate sf0.1's documents/embeddings R
times as DISJOINT sub-corpora, so the near-dup/ANN family structure
replicates exactly Rx instead of forming R-member cross-rep duplicate
families (which would inflate pair counts by C(R,2) — quadratic by
construction — and say nothing about operator scaling).

Disjointness must hold at EVERY granularity an operator fingerprints:

- WORD level (shingle/MinHash dedup): every word gets a per-rep tag.
- CHARACTER level (the perceptual SimHash runs on char 4-grams, so a
  plain `word_r3` suffix leaves most grams shared across reps and makes
  cross-rep perceptual pairs quadratic): after tagging, the whole text
  maps through a PER-REP AFFINE CHAR SUBSTITUTION c -> alpha[(a*i+b)%26]
  (a coprime to 26; 312 distinct bijections). A bijection preserves gram
  equality WITHIN a rep — pair structure replicates — while cross-rep
  grams scramble to md5-random votes (expected Hamming ~32 >> any
  near-dup threshold). Rep 0 is the identity (the 1x slice is the
  original corpus). The generator asserts the transformed vocabularies
  are pairwise disjoint and fails loudly otherwise.
- EMBEDDING space: rep r applies an ORTHOGONAL transform — cyclic
  dimension shift by (r % 64), plus alternate-dimension sign flips for
  r >= 64 — so within-rep cosine structure is identical while cross-rep
  pairs scramble to background similarity (distinct transforms below
  R = 128).

ids: id' = id + r * 10_000_000. Other tables are hard-linked (fallback:
copied) from the source dir so the validator's view creation works.

--plant-strong additionally plants STRONG embedding pairs (every 20th
vector per rep gets a companion at id + 5_000_000 whose vector is the
transformed original nudged by 0.1*norm along one dimension — angle
<= asin(0.1), cosine >= 0.995): the disjoint-rep corpus has no pairs
above cos 0.6, so without planting, a recall contract at the cos 0.8
deployment threshold measures nothing, and 10x wall-clock for the
high-recall tiers measures the fixture's weak-threshold background
rather than the operator (SCALE10X round-7 lesson: q341 read 8.5x
because its ANSWER grew 16x).

Usage: python3 tools/make_scale_fixture.py <src_sf_dir> <out_dir> <reps> [--plant-strong]
"""
import os, shutil, string, sys

import pyarrow as pa
import pyarrow.parquet as pq

OFFSET = 10_000_000
COPRIMES = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]
ALPHA = string.ascii_lowercase


def rep_map(r):
    """Affine char bijection for rep r (rep 0 = identity)."""
    a = COPRIMES[(r // 26) % 12]
    b = r % 26
    return str.maketrans(ALPHA, "".join(ALPHA[(a * i + b) % 26] for i in range(26)))


def rep_tag(r):
    """Per-rep word tag in [a-z] (pre-substitution), 'qx' + base-26 of r."""
    hi, lo = divmod(r, 26)
    return "qx" + ALPHA[hi % 26] + ALPHA[lo]


def transform_text(text, r, table, tag):
    if r == 0 or text is None:
        return text
    return " ".join(w + tag if w else w for w in text.split(" ")).translate(table)


PLANT_OFFSET = 5_000_000
PLANT_EVERY = 20


def main():
    src, out, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    plant = "--plant-strong" in sys.argv[4:]
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet")
    texts = docs.column("text").to_pylist()
    doc_ids = docs.column("doc_id").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()

    # disjointness assert: no transformed word may appear in two reps
    vocab = sorted(set(w for t in texts if t for w in t.split(" ") if w))
    seen = {}
    for r in range(reps):
        table, tag = rep_map(r), rep_tag(r)
        for w in vocab:
            tw = (w + tag).translate(table) if r else w
            if tw in seen:
                sys.exit(f"[fixture] vocab collision: rep {r} and rep "
                         f"{seen[tw]} both produce {tw!r}")
            seen[tw] = r

    dschema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                         ("lang", pa.string()), ("source", pa.string()),
                         ("n_chars", pa.int64())])
    ndocs = 0
    with pq.ParquetWriter(f"{out}/documents.parquet", dschema) as w:
        for r in range(reps):
            table, tag = rep_map(r), rep_tag(r)
            tx = [transform_text(t, r, table, tag) for t in texts]
            w.write_table(pa.table(
                {"doc_id": pa.array([i + r * OFFSET for i in doc_ids], pa.int64()),
                 "text": pa.array(tx, pa.string()),
                 "lang": pa.array(langs, pa.string()),
                 "source": pa.array(sources, pa.string()),
                 "n_chars": pa.array([len(t) if t is not None else None for t in tx],
                                     pa.int64())}, schema=dschema))
            ndocs += len(tx)

    emb = pq.read_table(f"{src}/embeddings.parquet")
    vec_ids = emb.column("vec_id").to_pylist()
    vecs = emb.column("embedding").to_pylist()
    labels = emb.column("label").to_pylist()
    eschema = pa.schema([("vec_id", pa.int64()),
                         ("embedding", pa.list_(pa.float32())),
                         ("label", pa.int32())])
    nvecs = 0
    nplanted = 0
    with pq.ParquetWriter(f"{out}/embeddings.parquet", eschema) as w:
        for r in range(reps):
            shift, flip = r % 64, (r // 64) % 2
            ev = []
            out_ids = [i + r * OFFSET for i in vec_ids]
            out_labels = list(labels)
            for v in vecs:
                if v is None:
                    ev.append(None); continue
                x = v[shift:] + v[:shift]
                if flip:
                    x = [e if (d % 2 == 0) else -e for d, e in enumerate(x)]
                ev.append(x)
            if plant:
                # companion = transformed vector nudged by 0.1*norm along
                # dim (id % 64): angle <= asin(0.1), cos >= 0.995 — a
                # strong pair by construction, deterministic per id
                for i, x, lb in list(zip(vec_ids, ev, labels)):
                    if x is None or i % PLANT_EVERY != 0:
                        continue
                    norm = sum(e * e for e in x) ** 0.5
                    if norm == 0:
                        continue
                    k = i % 64
                    y = list(x)
                    y[k] = y[k] + 0.1 * norm
                    out_ids.append(i + r * OFFSET + PLANT_OFFSET)
                    ev.append(y)
                    out_labels.append(lb)
                    nplanted += 1
            w.write_table(pa.table(
                {"vec_id": pa.array(out_ids, pa.int64()),
                 "embedding": pa.array(ev, pa.list_(pa.float32())),
                 "label": pa.array(out_labels, pa.int32())}, schema=eschema))
            nvecs += len(ev)

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if os.path.exists(d):
            os.remove(d)
        try:
            os.link(s, d)
        except OSError:
            shutil.copyfile(s, d)
    planted = f" planted={nplanted}" if plant else ""
    print(f"[fixture] {out}: documents={ndocs} embeddings={nvecs}"
          f" (reps={reps}){planted}")


if __name__ == "__main__":
    main()
