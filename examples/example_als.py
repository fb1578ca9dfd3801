"""End-to-end ALS walkthrough (counterpart of the reference's
``examples/example_als.py``): build a database from a MatrixMarket
file, train ALS, inspect most-similar items, batch-retrieve with
ParALS, and save/load the model.

Usage:
  python examples/example_als.py --mm /path/to/main.mtx \
      --uid /path/to/uid --iid /path/to/iid
  python examples/example_als.py            # tiny synthetic demo
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


def make_demo_dataset(tmp_dir: str):
    """A small clustered dataset so most_similar is meaningful."""
    rng = np.random.default_rng(0)
    num_users, num_items, clusters = 400, 120, 6
    group = num_items // clusters
    mm = os.path.join(tmp_dir, "main.mtx")
    lines = []
    for u in range(num_users):
        c = u % clusters
        items = np.unique(np.concatenate([
            rng.integers(c * group, (c + 1) * group, 24),
            rng.integers(0, num_items, 6)]))
        lines += [f"{u + 1} {int(i) + 1} {rng.integers(1, 6)}"
                  for i in items]
    with open(mm, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{num_users} {num_items} {len(lines)}\n")
        f.write("\n".join(lines) + "\n")
    uid = os.path.join(tmp_dir, "uid")
    iid = os.path.join(tmp_dir, "iid")
    with open(uid, "w") as f:
        f.writelines(f"user_{u}\n" for u in range(num_users))
    with open(iid, "w") as f:
        f.writelines(f"movie_{i}\n" for i in range(num_items))
    return mm, uid, iid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mm", default=None)
    ap.add_argument("--uid", default=None)
    ap.add_argument("--iid", default=None)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()

    import buffalo_tpu
    from buffalo_tpu import ALS, ALSOption, MatrixMarketOptions, ParALS

    tmp = tempfile.mkdtemp(prefix="buffalo_tpu_example_")
    if args.mm is None:
        args.mm, args.uid, args.iid = make_demo_dataset(tmp)

    # 1. build the database (reference example_als.py:14-30)
    data_opt = MatrixMarketOptions().get_default_option()
    data_opt.input.main = args.mm
    if args.uid:
        data_opt.input.uid = args.uid
    if args.iid:
        data_opt.input.iid = args.iid
    data_opt.data.path = os.path.join(tmp, "mm.bfo")
    data_opt.data.validation = {"name": "sample", "p": 0.1,
                                "max_samples": 500}

    # 2. configure + train ALS
    opt = ALSOption().get_default_option()
    opt.d = args.d
    opt.num_iters = args.epochs
    opt.validation = {"topk": 10}
    als = ALS(opt, data_opt=data_opt)
    als.initialize()
    result = als.train()
    print("train:", {k: round(v, 4) for k, v in result.items()})

    # 3. point queries
    als.build_itemid_map()
    als.build_userid_map()
    item_key = als._idmanager.itemids[0]
    print(f"\nmost similar to {item_key}:")
    for key, score in als.most_similar(item_key, topk=5):
        print(f"  {key}: {score:.4f}")

    user_key = als._idmanager.userids[0]
    print(f"\ntop-5 recommendation for {user_key}:")
    for key in als.topk_recommendation(user_key, topk=5):
        print(f"  {key}")

    # 4. batched retrieval (Parallels layer)
    par = ParALS(als)
    keys = als._idmanager.itemids[:64]
    topks, scores = par.most_similar(keys, topk=5)
    print(f"\nParALS: batched most_similar over {len(keys)} queries -> "
          f"{np.asarray(topks).shape}")
    # approx=True swaps exact top-k for lax.approx_max_k (measured
    # 2.1x faster at 505k-wide catalogs on a v5e, recall@10 ~0.98);
    # mesh=/num_devices= shards the catalog over a device mesh
    par_fast = ParALS(als, approx=True)
    fast_topks, _ = par_fast.most_similar(keys, topk=5)

    # 5. ANN retrieval (reference example_als.py:56-76 builds an n2
    # HNSW index; here the bundled TPU-native IVF index backs the same
    # set_ann_index hook — build on the normalized factors, save,
    # point the facade at the saved file, query sublinearly)
    from buffalo_tpu.parallel import IVFIndex
    als.normalize("item")
    index = IVFIndex.build(als.Q, n_probe=8)
    index_path = os.path.join(tmp, "als.ivf.index")
    index.save(index_path)
    par.set_ann_index(index_path + ".npz")
    ann_topks, _ = par.most_similar(keys, topk=5)
    exact = np.asarray(topks)
    recall = np.mean([len(set(a) & set(e)) / len(set(e))
                      for a, e in zip(np.asarray(ann_topks), exact)])
    print(f"IVF ANN over {len(keys)} queries: recall@5 {recall:.3f} "
          f"vs exact scan")

    # 6. save / load round trip
    model_path = os.path.join(tmp, "als.bin")
    als.save(model_path)
    als2 = ALS.new(model_path)
    assert np.allclose(als.Q, als2.Q)
    print(f"\nsaved + reloaded: {model_path}")


if __name__ == "__main__":
    main()
