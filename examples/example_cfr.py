"""CoFactor (CFR) walkthrough (counterpart of the reference's
``examples/jupyter-examples/2. Cofactor.ipynb``): build a stream
database in ``matrix`` mode with an SPPMI co-occurrence group, train
the three-phase joint factorization (user / item / context), then
query similar items and batch-retrieve with ParCFR.

CFR factorizes the user-item matrix and the item-item SPPMI matrix
jointly, so item embeddings are shaped both by who consumed them and
by which items they co-occur with.

Usage:
  python examples/example_cfr.py --stream /path/to/main   # real corpus
  python examples/example_cfr.py                          # synthetic demo
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from buffalo_tpu.utils import pin_cpu

pin_cpu()  # re-pin before backend init if JAX_PLATFORMS=cpu

import numpy as np


def make_demo_corpus(tmp_dir: str) -> str:
    """Item sequences drawn from clusters: same-cluster items share
    consumers AND co-occur inside sequences, which is exactly the
    signal CFR couples."""
    rng = np.random.default_rng(11)
    num_items, clusters = 90, 6
    cl = rng.integers(0, clusters, num_items)
    lines = []
    for _ in range(500):
        c = rng.integers(0, clusters)
        members = np.nonzero(cl == c)[0]
        seq = rng.choice(members, size=14, replace=True)
        lines.append(" ".join(f"item{int(x)}" for x in seq))
    path = os.path.join(tmp_dir, "main.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", default=None,
                    help="stream file: one line of space-separated "
                         "item tokens per user")
    ap.add_argument("--d", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=15)
    args = ap.parse_args()

    from buffalo_tpu import CFR, CFROption, ParCFR, StreamOptions

    tmp = tempfile.mkdtemp(prefix="buffalo_tpu_cfr_")
    if args.stream is None:
        args.stream = make_demo_corpus(tmp)

    # 1. build: matrix-type stream + SPPMI co-occurrence group
    #    (windows=5 context width, k=1 negative-sampling shift)
    data_opt = StreamOptions().get_default_option()
    data_opt.input.main = args.stream
    data_opt.data.path = os.path.join(tmp, "cfr.bfo")
    data_opt.data.tmp_dir = os.path.join(tmp, "tmp")
    data_opt.data.internal_data_type = "matrix"
    data_opt.data.validation = {"name": "sample", "p": 0.1,
                                "max_samples": 500}
    data_opt.data.sppmi = {"windows": 5, "k": 1}

    # 2. configure + train the three-phase epoch
    opt = CFROption().get_default_option()
    opt.d = args.d
    opt.num_iters = args.epochs
    opt.validation = {"topk": 10}
    cfr = CFR(opt, data_opt=data_opt)
    cfr.initialize()
    result = cfr.train()
    print("train:", {k: round(float(v), 4) for k, v in result.items()})

    # 3. similar items out of the jointly-learned embedding
    cfr.build_itemid_map()
    cfr.build_userid_map()
    item_key = cfr._idmanager.itemids[0]
    print(f"\nmost similar to {item_key!r}:")
    for key, score in cfr.most_similar(item_key, topk=5):
        print(f"  {key}: {score:.4f}")

    # 4. per-user recommendations
    user_key = cfr._idmanager.userids[0]
    print(f"\ntop-5 recommendation for {user_key!r}:")
    for key in cfr.topk_recommendation(user_key, topk=5):
        print(f"  {key}")

    # 5. batched retrieval
    par = ParCFR(cfr)
    keys = cfr._idmanager.itemids[:32]
    topks, scores = par.most_similar(keys, topk=5)
    print(f"\nParCFR: batched most_similar over {len(keys)} queries -> "
          f"{np.asarray(topks).shape}")

    # 6. save / load round trip
    model_path = os.path.join(tmp, "cfr.bin")
    cfr.save(model_path)
    cfr2 = CFR.new(model_path)
    assert np.allclose(cfr.I, cfr2.I)
    print(f"\nsaved + reloaded: {model_path}")


if __name__ == "__main__":
    main()
