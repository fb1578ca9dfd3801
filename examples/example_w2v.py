"""Skip-gram W2V walkthrough over stream data (counterpart of the
reference's ``examples/jupyter-examples/3. skip-gram.ipynb``): build a
stream database (one line = one user's token sequence), train
skip-gram with negative sampling, query nearest words, solve an
analogy, and batch-retrieve with ParW2V.

Usage:
  python examples/example_w2v.py --stream /path/to/main  # real corpus
  python examples/example_w2v.py                         # synthetic demo
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
    """Sentences drawn from word clusters, so same-cluster words
    co-occur and the embedding has structure worth querying."""
    rng = np.random.default_rng(7)
    vocab, clusters = 80, 8
    cl = rng.integers(0, clusters, vocab)
    lines = []
    for _ in range(600):
        c = rng.integers(0, clusters)
        members = np.nonzero(cl == c)[0]
        sent = rng.choice(members, size=12, replace=True)
        lines.append(" ".join(f"w{int(x)}" for x in sent))
    path = os.path.join(tmp_dir, "main.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", default=None,
                    help="stream file: one line of space-separated "
                         "tokens per user/sentence")
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()

    from buffalo_tpu import W2V, ParW2V, StreamOptions, W2VOption

    tmp = tempfile.mkdtemp(prefix="buffalo_tpu_w2v_")
    if args.stream is None:
        args.stream = make_demo_corpus(tmp)

    # 1. build the stream database (order-preserving token sequences)
    data_opt = StreamOptions().get_default_option()
    data_opt.input.main = args.stream
    data_opt.data.path = os.path.join(tmp, "w2v.bfo")
    data_opt.data.tmp_dir = os.path.join(tmp, "tmp")
    data_opt.data.validation = {}

    # 2. configure + train skip-gram
    opt = W2VOption().get_default_option()
    opt.d = args.d
    opt.num_iters = args.epochs
    opt.min_count = 2
    opt.window = 5
    opt.num_negative_samples = 5
    w2v = W2V(opt, data_opt=data_opt)
    w2v.initialize()
    result = w2v.train()
    print("train:", {k: round(float(v), 4) for k, v in result.items()})

    # 3. nearest-neighbor queries on the learned word vectors
    w2v.build_itemid_map()
    word = w2v._idmanager.itemids[0]
    print(f"\nmost similar to {word!r}:")
    for key, score in w2v.most_similar(word, topk=5):
        print(f"  {key}: {score:.4f}")

    # 4. analogy: a is to b as c is to ?
    a, b, c = w2v._idmanager.itemids[:3]
    print(f"\nanalogy {a} : {b} :: {c} : ?")
    for key, score in w2v.analogy(a, b, c, topk=3):
        print(f"  {key}: {score:.4f}")

    # 5. batched retrieval over many query words at once
    par = ParW2V(w2v)
    keys = w2v._idmanager.itemids[:32]
    topks, scores = par.most_similar(keys, topk=5)
    print(f"\nParW2V: batched most_similar over {len(keys)} queries -> "
          f"{np.asarray(topks).shape}")

    # 6. save / load round trip
    model_path = os.path.join(tmp, "w2v.bin")
    w2v.save(model_path)
    w2v2 = W2V.new(model_path)
    assert np.allclose(w2v.L0, w2v2.L0)
    print(f"\nsaved + reloaded: {model_path}")


if __name__ == "__main__":
    main()
