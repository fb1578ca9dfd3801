"""Convert raw public datasets into buffalo_tpu input formats.

Counterpart of the reference ``tests/preprocess.py:7-108``: turns raw
downloads of ML-100k / ML-20M / text8 / KakaoBrunch12M into the
MatrixMarket (``main`` + ``uid``/``iid``) and stream formats the test
and benchmark suites consume.  This environment has no network egress,
so nothing is downloaded — place the raw files under ``tests/ext/``
yourself:

  ext/ml-100k/u.data u.item u.user     (grouplens ml-100k)
  ext/ml-20m/ratings.csv movies.csv    (grouplens ml-20m)
  ext/text8/text8                      (mattmahoney text8)
  ext/kakao-brunch-12m/views           (kakao arena brunch)

Then:  python tests/preprocess.py
"""
from __future__ import annotations

import os

HERE = os.path.dirname(os.path.abspath(__file__))
EXT = os.path.join(HERE, "ext")


def ml100k():
    root = os.path.join(EXT, "ml-100k")
    if not os.path.isfile(os.path.join(root, "u.data")):
        return False
    rows = []
    with open(os.path.join(root, "u.data")) as fin:
        for line in fin:
            u, i, v, ts = line.strip().split("\t")
            rows.append((int(u), int(i), int(v), int(ts)))
    rows.sort()
    with open(os.path.join(root, "main"), "w") as fout:
        fout.write("%%MatrixMarket matrix coordinate integer general\n")
        fout.write(f"943 1682 {len(rows)}\n")
        fout.writelines(f"{u} {i} {v}\n" for u, i, v, _ in rows)
    with open(os.path.join(root, "uid"), "w") as fout:
        fout.writelines(f"{u}\n" for u in range(1, 944))
    with open(os.path.join(root, "iid"), "w", encoding="utf-8") as fout:
        with open(os.path.join(root, "u.item"),
                  encoding="ISO-8859-1") as fin:
            iids = [line.strip().split("|")[1].replace(" ", "_")
                    for line in fin]
        fout.writelines(f"{idx}.{key}\n"
                        for idx, key in enumerate(iids))
    # stream format: per-user item sequence in timestamp order
    by_user = {}
    for u, i, v, ts in rows:
        by_user.setdefault(u, []).append((ts, i))
    with open(os.path.join(root, "stream"), "w") as fout:
        for u in range(1, 944):
            seq = sorted(by_user.get(u, []))
            fout.write(" ".join(str(i) for _, i in seq) + "\n")
    return True


def ml20m():
    root = os.path.join(EXT, "ml-20m")
    src = os.path.join(root, "ratings.csv")
    if not os.path.isfile(src):
        return False
    import pandas as pd
    df = pd.read_csv(src)
    uids = sorted(df["userId"].unique())
    iids = sorted(df["movieId"].unique())
    umap = {u: n + 1 for n, u in enumerate(uids)}
    imap = {i: n + 1 for n, i in enumerate(iids)}
    with open(os.path.join(root, "main"), "w") as fout:
        fout.write("%%MatrixMarket matrix coordinate real general\n")
        fout.write(f"{len(uids)} {len(iids)} {len(df)}\n")
        for u, i, v in zip(df["userId"], df["movieId"], df["rating"]):
            fout.write(f"{umap[u]} {imap[i]} {v}\n")
    with open(os.path.join(root, "uid"), "w") as fout:
        fout.writelines(f"{u}\n" for u in uids)
    with open(os.path.join(root, "iid"), "w") as fout:
        fout.writelines(f"{i}\n" for i in iids)
    return True


def text8():
    root = os.path.join(EXT, "text8")
    src = os.path.join(root, "text8")
    if not os.path.isfile(src):
        return False
    with open(src) as fin:
        words = fin.read().split()
    # one "sentence" per 1000 words (reference main.stream layout)
    with open(os.path.join(root, "main"), "w") as fout:
        for beg in range(0, len(words), 1000):
            fout.write(" ".join(words[beg:beg + 1000]) + "\n")
    return True


def brunch12m():
    root = os.path.join(EXT, "kakao-brunch-12m")
    src = os.path.join(root, "views")
    if not os.path.isfile(src):
        return False
    # already "userid item item ..." per line; strip the id column
    with open(src) as fin, \
            open(os.path.join(root, "main"), "w") as fout, \
            open(os.path.join(root, "uid"), "w") as uout:
        for line in fin:
            parts = line.strip().split()
            if not parts:
                continue
            uout.write(parts[0] + "\n")
            fout.write(" ".join(parts[1:]) + "\n")
    return True


if __name__ == "__main__":
    for name, fn in [("ml-100k", ml100k), ("ml-20m", ml20m),
                     ("text8", text8), ("kakao-brunch-12m", brunch12m)]:
        done = fn()
        print(f"{name}: {'prepared' if done else 'raw files not found, skipped'}")
