"""Deterministically (re)generate the real-format loader fixture files.

The environment has no egress, so the loaders had only ever parsed
in-memory DataFrames in tests (VERDICT r4 next-step #7).  These files
reproduce each upstream dataset's EXACT on-disk format at a few hundred
rows so every ``create_*_dataset`` is round-trip-tested from a real file:

* ml100k/u.data, u.user, u.item — tab / pipe / pipe-latin-1, headerless
  (format per /root/reference/src/match/utils/data_process.py:22-34)
* ml_latest_ratings.csv — userId,movieId,rating,timestamp header
  (ref src/match/utils/data_process.py:92)
* amazon_reviews.json / amazon_meta.json — python-literal lines with
  single quotes, the reason the reference uses per-line eval
  (ref src/ctr/utils/data_process.py:103)
* census_train.csv / census_test.csv — 42 headerless comma columns with
  the dataset's leading-space tokens and '50000+.' labels
  (ref src/ctr/utils/data_process.py:241-252)
* criteo_sample.csv — label,I1..I13,C1..C26 header, with empty fields
  (ref src/ctr/utils/data_process.py:47-66)

Run from the repo root: python tests/assets/make_fixtures.py
"""
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
rng = np.random.default_rng(42)


def w(path, lines):
    full = os.path.join(HERE, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w", encoding="latin-1") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{path}: {len(lines)} lines")


# ---- ml-100k ------------------------------------------------------------
N_USERS, N_ITEMS = 60, 80
occupations = ["technician", "writer", "executive", "student", "other"]
u_user = [
    f"{u + 1}|{rng.integers(18, 70)}|{'MF'[int(rng.integers(0, 2))]}|"
    f"{occupations[int(rng.integers(0, len(occupations)))]}|"
    f"{rng.integers(10000, 99999)}"
    for u in range(N_USERS)
]
w("ml100k/u.user", u_user)
months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun"]
u_item = [
    f"{i + 1}|Film Titre No.{i + 1} ({1990 + i % 9})|"
    f"01-{months[i % 6]}-{1990 + i % 9}|"
    f"|http://us.imdb.com/M/title-exact?{i + 1}|0|1|0|0"
    for i in range(N_ITEMS)
]
w("ml100k/u.item", u_item)
rows = []
for u in range(N_USERS):
    seen = rng.choice(N_ITEMS, size=rng.integers(6, 14), replace=False)
    for k, it in enumerate(seen):
        rows.append(
            f"{u + 1}\t{it + 1}\t{rng.integers(1, 6)}\t"
            f"{874000000 + u * 1000 + k}"
        )
w("ml100k/u.data", rows)

# ---- ml-latest-small ratings.csv ---------------------------------------
lines = ["userId,movieId,rating,timestamp"]
for u in range(50):
    n = rng.integers(6, 15)
    items = rng.choice(60, size=n, replace=False)
    for k, it in enumerate(items):
        lines.append(
            f"{u + 1},{it + 1},{rng.integers(1, 11) / 2:.1f},"
            f"{964980000 + u * 777 + k}"
        )
w("ml_latest_ratings.csv", lines)

# ---- amazon electronics reviews + meta (python-literal lines) ----------
asins = [f"B00{i:04d}" for i in range(70)]
cats = ["Cables", "Chargers", "Headphones", "Speakers"]
meta = [
    "{'asin': '%s', 'title': \"It's a gadget #%d\", 'categories': "
    "[['Electronics', '%s']]}" % (a, i, cats[i % len(cats)])
    for i, a in enumerate(asins)
]
w("amazon_meta.json", meta)
reviews = []
for u in range(45):
    n = rng.integers(5, 10)
    its = rng.choice(len(asins), size=n, replace=False)
    for k, it in enumerate(its):
        reviews.append(
            "{'reviewerID': 'A%05d', 'asin': '%s', 'overall': %.1f, "
            "'unixReviewTime': %d, 'reviewText': \"don't care\"}"
            % (u, asins[it], rng.integers(1, 6), 1380000000 + u * 500 + k)
        )
w("amazon_reviews.json", reviews)

# ---- census income ------------------------------------------------------
from recsys_tpu.data.census import COLUMNS, DENSE_COLS  # noqa: E402

maritals = [" Never married", " Married-civilian spouse present",
            " Divorced", " Widowed"]
workers = [" Private", " Self-employed-not incorporated",
           " Not in universe", " Federal government"]


def census_row():
    vals = []
    for c in COLUMNS:
        if c == "income_50k":
            vals.append(" 50000+." if rng.random() < 0.25 else " - 50000.")
        elif c == "marital_stat":
            vals.append(maritals[int(rng.integers(0, len(maritals)))])
        elif c == "class_worker":
            vals.append(workers[int(rng.integers(0, len(workers)))])
        elif c in DENSE_COLS:
            vals.append(str(int(rng.integers(0, 90))))
        elif c == "instance_weight":
            vals.append(f" {rng.random() * 5000:.2f}")
        else:
            vals.append(f" tok{int(rng.integers(0, 6))}")
    return ",".join(vals)


w("census_train.csv", [census_row() for _ in range(300)])
w("census_test.csv", [census_row() for _ in range(120)])

# ---- criteo sample ------------------------------------------------------
header = ",".join(["label"] + [f"I{i}" for i in range(1, 14)]
                  + [f"C{i}" for i in range(1, 27)])
lines = [header]
for r in range(400):
    i1 = rng.random()
    y = int(rng.random() < 1 / (1 + np.exp(-3 * (i1 - 0.5))))
    dense = [f"{i1:.3f}"] + [
        "" if rng.random() < 0.1 else str(int(rng.integers(0, 500)))
        for _ in range(12)
    ]
    cat = ["" if rng.random() < 0.1 else f"{rng.integers(0, 1 << 28):07x}"
           for _ in range(26)]
    lines.append(",".join([str(y)] + dense + cat))
w("criteo_sample.csv", lines)
