"""Skip-gram word2vec over item streams on TPU.

Counterpart of the reference W2V stack (driver ``buffalo/algo/w2v.py``,
C++ core ``lib/algo_impl/w2v/w2v.cc``): vocabulary build with
``min_count`` filtering, frequent-word subsampling via the uint32
scale table (w2v.py:91-133), cumulative unigram^0.75 negative table
(w2v.py:140-157), per-position shrunken windows (w2v.cc:239-241),
linear lr decay by processed words, and ``most_similar`` over the
input embedding L0 with vocab index remapping.  The per-sentence
hogwild workers become: vectorized host-side pair generation per epoch
(subsample + reduced windows in numpy) feeding fixed-size device pair
chunks (ops/w2v_kernels).

Reference: Mikolov et al., Distributed Representations of Words and
Phrases and their Compositionality (NIPS 2013).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

from buffalo_tpu.data.base import Data
from buffalo_tpu.evaluate import Evaluable
from buffalo_tpu.models.base import Algo, Serializable
from buffalo_tpu.models.options import W2VOption
from buffalo_tpu.ops import sgd_kernels as K
from buffalo_tpu.ops.w2v_kernels import w2v_epoch
from buffalo_tpu.utils import Option, log


class W2V(Algo, W2VOption, Evaluable, Serializable):
    """Python driver for TPU W2V."""

    def __init__(self, opt_path=None, *args, **kwargs):
        Algo.__init__(self, *args, **kwargs)
        W2VOption.__init__(self, *args, **kwargs)
        Evaluable.__init__(self, *args, **kwargs)
        Serializable.__init__(self, *args, **kwargs)
        self._setup_driver(opt_path, W2VOption, "W2V", ["stream"], kwargs)
        self._vocab = Option({"size": 0, "index": None, "inv_index": None,
                              "scale": None, "dist": None,
                              "total_word_count": 0})

    @staticmethod
    def new(path, data_fields=[]):
        return W2V.instantiate(W2VOption, path, data_fields)

    def set_data(self, data):
        assert isinstance(data, Data), f"Wrong instance: {type(data)}"
        self.data = data
        self._token_stream_cache = None

    def normalize(self, group="item"):
        if group == "item" and not self.opt.get("_nrz_L0"):
            self.L0 = self._normalize(self.L0)
            self.opt._nrz_L0 = True

    def get_index(self, key, group="item"):
        """Item index -> dense vocab index (w2v.py:66-76)."""
        is_many = isinstance(key, list)
        indexes = super().get_index(key, group)
        if not is_many:
            indexes = [indexes]
        indexes = [None if i is None or self._vocab.index[i] < 1
                   else self._vocab.index[i] - 1 for i in indexes]
        if not is_many:
            return indexes[0]
        return indexes

    def _get_feature(self, index, group="item"):
        if group == "item" and index is not None:
            return self.L0[index]
        return None

    def initialize(self):
        super().initialize()
        assert self.data, "Data is not set"
        self.build_vocab()
        self.init_factors(self._vocab.size)

    def build_vocab(self):
        """min_count filter, subsample scale table, unigram^0.75 dist
        (w2v.py:91-133,140-157)."""
        self._token_stream_cache = None   # vocab index map changes
        header = self.data.get_header()
        group = self.data.get_group("rowwise")
        keys = np.asarray(group["key"])
        uni = np.bincount(keys, minlength=header["num_items"]).astype(np.int64)
        total_word_count = int(len(keys))

        use_mask = uni >= self.opt.min_count
        total_vocab = int(use_mask.sum())
        use = np.zeros(header["num_items"], dtype=np.int32)
        use[use_mask] = np.arange(1, total_vocab + 1)

        threshold_count = float(uni[use_mask].sum())
        if self.opt.sample > 0.0:
            threshold_count *= self.opt.sample
        scale = np.zeros(total_vocab, dtype=np.uint32)
        cnt = uni[use_mask].astype(np.float64)
        p = (np.sqrt(cnt / threshold_count) + 1.0) * (threshold_count / cnt)
        p = np.minimum(p, 1.0)
        scale[:] = (p * 0xFFFFFFFF).astype(np.uint64).astype(np.uint32)
        self.logger.info(
            f"Downsampled {int((p < 1.0).sum())} most-common words.")

        dist0 = cnt ** 0.75
        dist0 /= dist0.sum()
        dist = (np.cumsum(dist0) * 0x7FFFFFFF).astype(np.int32)

        self._vocab.size = total_vocab
        self._vocab.scale = scale
        self._vocab.index = use
        self._vocab.inv_index = np.nonzero(use_mask)[0].astype(np.int32)
        self._vocab.dist = dist
        self._vocab.total_word_count = total_word_count
        self.logger.info(f"Vocab({total_vocab}) TotalWords({total_word_count})")

    def get_sampling_distribution(self, uni, use, total_vocab):
        """Cumulative unigram^0.75 negative-sampling table — the
        reference's public helper (w2v.py:140-157), kept for call-site
        parity: ``uni`` per-raw-item counts, ``use`` 1-based compacted
        index (0 = dropped), returns int32 cum table scaled to 2^31-1.
        ``build_vocab`` computes the same table vectorized."""
        dist0 = np.zeros(total_vocab, dtype=np.float64)
        use = np.asarray(use)
        uni = np.asarray(uni)
        kept = use > 0
        dist0[use[kept] - 1] = uni[kept]
        dist0 = dist0 ** 0.75
        dist0 /= dist0.sum()
        return (np.cumsum(dist0) * 0x7FFFFFFF).astype(np.int32)

    def init_factors(self, vocab_size):
        d = self.opt.d
        self.L0 = np.abs(np.random.normal(
            scale=1.0 / (d ** 2), size=(vocab_size, d)).astype("float32"))
        self.L1 = np.zeros((vocab_size, d), dtype=np.float32)

    # ------------------------------------------------------------- retrieval
    def _get_topk_recommendation(self, rows, topk, pool=None):
        raise NotImplementedError

    def _get_most_similar_item(self, col, topk, pool):
        if not isinstance(col, np.ndarray):
            col = self._vocab.index[col] - 1
            if col < 0:
                return [], []
        topks, scores = super()._get_most_similar_item(
            col, topk, self.L0, self.opt.get("_nrz_L0", False), pool)
        topks = self._vocab.inv_index[topks]
        return topks, scores

    def most_similar_vec(self, vec, topk=10, exclude=()):
        """Top-k vocab keys by cosine to an arbitrary d-vector."""
        L0 = self.L0 / (np.linalg.norm(self.L0, axis=1, keepdims=True)
                        + 1e-12)
        scores = L0 @ (vec / (np.linalg.norm(vec) + 1e-12))
        if exclude:
            scores[list(exclude)] = -np.inf
        top = np.argsort(-scores)[:topk]
        # lazy id state: a deserialized serving model has the map
        # restored (itemid_mapped=True) but no data attached —
        # build_itemid_map() would rebuild unconditionally and crash
        keys, _ = self._id_state("item")
        return [(keys[self._vocab.inv_index[t]], float(scores[t]))
                for t in top]

    def analogy(self, a: str, b: str, c: str, topk: int = 10):
        """``a : b :: c : ?`` via vector offset (b - a + c), the
        reference's text8 question-words evaluation semantics
        (tests/algo/test_w2v.py:62-70)."""
        idx = self.get_index([a, b, c])
        if any(i is None for i in idx):
            return []
        va, vb, vc = (self.L0[i] / (np.linalg.norm(self.L0[i]) + 1e-12)
                      for i in idx)
        return self.most_similar_vec(vb - va + vc, topk=topk,
                                     exclude=idx)

    def get_scores(self, row_col_pairs):
        return []

    def _get_scores(self, row, col):
        return np.zeros(len(row), dtype=np.float32)

    # -------------------------------------------------------------- training
    def _token_stream(self):
        """Epoch-invariant in-vocab token stream (cached): vocab ids +
        sentence ids for every corpus token that survived the vocab
        min_count cut.  Only the subsample draw changes per epoch."""
        cached = getattr(self, "_token_stream_cache", None)
        if cached is not None:
            return cached
        group = self.data.get_group("rowwise")
        indptr = np.asarray(group["indptr"])
        keys = np.asarray(group["key"])
        vocab_idx = self._vocab.index[keys] - 1     # -1 = out of vocab
        sent_ids = np.repeat(
            np.arange(len(indptr) - 1, dtype=np.int32), np.diff(indptr))
        in_vocab = vocab_idx >= 0
        cached = (vocab_idx[in_vocab].astype(np.int32),
                  sent_ids[in_vocab])
        self._token_stream_cache = cached
        return cached

    def _generate_pairs(self, rng: np.random.Generator):
        """Per-epoch pair generation: subsample + shrunken windows
        (w2v.cc:227-246).  Returns (inputs, targets, n_kept_words).

        The subsample and window draws are numpy (cheap, seed-stable);
        the pair expansion rides the OpenMP kernel
        (``fileio_w2v_pairs_count/fill``) when the native library is
        available, with the vectorized offset-major numpy loop as the
        fallback — same pair multiset, different order (parity-tested
        in tests/data/test_native.py)."""
        all_words, all_sents = self._token_stream()
        # subsample: keep while scale > rand32 (w2v.cc:233-235)
        r = rng.integers(0, 1 << 32, size=len(all_words), dtype=np.uint64)
        keep = self._vocab.scale[all_words].astype(np.uint64) > r
        words = all_words[keep]
        sents = all_sents[keep]
        n = len(words)
        if n < 2:
            return (np.zeros(0, np.int32), np.zeros(0, np.int32), 0)

        window = int(self.opt.window)
        # per-center shrunken half-width: window - b, b ~ U[0, window)
        h = window - rng.integers(0, window, size=n)

        from buffalo_tpu.data import native
        got = native.w2v_pairs_native(words, sents, h, window)
        if got is not None:
            return (got[0], got[1], n)
        inputs, targets = [], []
        for off in range(1, window + 1):
            same = sents[:-off] == sents[off:]
            # center i, context i+off (context within center's window)
            m = same & (off <= h[:-off])
            targets.append(words[:-off][m])
            inputs.append(words[off:][m])
            # center i+off, context i
            m2 = same & (off <= h[off:])
            targets.append(words[off:][m2])
            inputs.append(words[:-off][m2])
        return (np.concatenate(inputs), np.concatenate(targets), n)

    def _train_stream(self, L0, L1, dist, rng, rng_np, statics,
                      d, full_st, training_callback, mesh=None):
        """On-device pair expansion path (``pair_gen="device"``): per
        epoch the host does only the subsample + compaction + shrunken
        window draws (numpy over the cached token stream, ~0.5 s at
        12M tokens) and ships ~9 bytes/token; the jitted epoch expands
        the skip-gram window itself (w2v_kernels.w2v_epoch_stream;
        with a mesh, ``w2v_epoch_stream_dp`` shards the position
        axis)."""
        import jax
        import jax.numpy as jnp

        from buffalo_tpu.ops.w2v_kernels import (w2v_epoch_stream,
                                                 w2v_epoch_stream_dp)

        opt = self.opt
        V = int(self._vocab.size)
        chunk_shard = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            chunk_shard = NamedSharding(mesh,
                                        PartitionSpec(None, "d"))
        window = int(opt.window)
        n_all = len(self._token_stream()[0])
        # the shared-negative block stays SMALL: one draw shared by
        # ~6 * block pairs is a real sampling change.  Brunch-scale
        # loss trajectories picked the default (see W2VOption
        # neg_block): block=4 matches the per-pair host path's
        # per-epoch convergence at 4.6 s/epoch; 16 converges ~2
        # epochs slower; >=128 fails the small-corpus purity gate
        # outright.  Auto additionally shrinks below the configured
        # block only for micro-corpora.
        block = int(opt.get("neg_block", 4))
        block = min(block,
                    max(4, 1 << int(np.log2(max(n_all // 256, 4)))))
        T = int(opt.get("batch_size") or 0)
        if T <= 0:
            T = 1 << 17
            # keep >= 16 sequential chunk updates per epoch — the
            # same megabatch-approximation rule as the host-pair
            # path; an earlier 4-chunk sizing converged visibly worse
            # (planted-cluster purity 0.79 vs the host path's 1.00 at
            # 5 epochs on the parity corpus).  Sized on the
            # epoch-invariant token count so the per-epoch subsample
            # jitter can't change the compiled shape.
            T = min(T, max(block, -(-n_all // (16 * block)) * block))
        # each mesh shard's T/D slice must itself be block-aligned
        quantum = block * (mesh.size if mesh is not None else 1)
        T = -(-T // quantum) * quantum
        G = int(opt.get("max_chunks_per_dispatch", 32))
        raw_words = float(self._vocab.total_word_count)
        total_words = raw_words * opt.num_iters
        processed_words = 0.0
        loss = None
        self.iteration_times = []
        stat = dict(window=window, block=block,
                    num_negatives=statics["num_negatives"],
                    vocab_size=V,
                    compute_loss=statics["compute_loss"],
                    max_step_norm=statics["max_step_norm"],
                    offset_mode=str(opt.get("offset_mode", "scan")))
        assert window < 256, "uint8 half-window wire format"

        def host_phase():
            """Per-epoch subsample + compaction + window draws; wire
            format is 6 bytes/token (int32 word + uint8 sentence
            boundary + uint8 half-window) — the r5 decomposition
            measured the int32 encoding's upload as the epoch's
            dominant term (`w2v_stream_decomp.log`)."""
            all_words, all_sents = self._token_stream()
            r = rng_np.integers(0, 1 << 32, size=len(all_words),
                                dtype=np.uint64)
            keep = self._vocab.scale[all_words].astype(np.uint64) > r
            words = all_words[keep]
            sents = all_sents[keep]
            n = len(words)
            h = (window - rng_np.integers(0, window, size=n)) \
                .astype(np.uint8)
            bnd = np.ones(n, np.uint8)
            if n > 1:
                bnd[1:] = sents[1:] != sents[:-1]
            # pad to a multiple-of-4 chunk count (subsampling jitters
            # n a little every epoch; a changed scan length recompiles)
            nchunks = -(-max(1, -(-n // T)) // 4) * 4
            if nchunks > G:
                nchunks = -(-nchunks // G) * G
            pad = nchunks * T - n
            wc = np.concatenate([words,
                                 np.full(pad, V, np.int32)]) \
                .reshape(nchunks, T)
            bc = np.concatenate([bnd, np.ones(pad, np.uint8)]) \
                .reshape(nchunks, T)
            hc = np.concatenate([h, np.zeros(pad, np.uint8)]) \
                .reshape(nchunks, T)
            return wc, bc, hc, nchunks

        # double-buffering holds TWO epochs of chunk arrays in HBM
        # (~6 bytes/token each); past the resident budget, fall back
        # to per-group staging (host prefetch still hides the numpy
        # phase, only the upload stops overlapping)
        epoch_bytes = 6 * (-(-n_all // T)) * T
        upload_prefetch = 2 * epoch_bytes <= int(
            opt.get("resident_mb", 4096)) * 1024 * 1024
        put = (lambda a: jax.device_put(a, chunk_shard)) \
            if mesh is not None else jax.device_put

        def stage(arrays):
            """Async device_put of every group's chunk slices —
            device transfers enqueue behind whatever the device is
            doing, so calling this while the PREVIOUS epoch's
            dispatches are in flight overlaps next-epoch uploads with
            compute (the upload was ~2 s of a ~3.5 s epoch)."""
            wc, bc, hc, nchunks = arrays
            g_len = min(G, nchunks)
            staged = []
            for g in range(nchunks // g_len):
                sl = slice(g * g_len, (g + 1) * g_len)
                if upload_prefetch:
                    staged.append((put(wc[sl]), put(bc[sl]),
                                   put(hc[sl])))
                else:
                    staged.append((wc[sl], bc[sl], hc[sl]))
            return staged, nchunks, g_len

        staged_next = None
        for i in range(opt.num_iters):
            start_t = time.time()
            if staged_next is None:
                staged_next = stage(host_phase())
            staged, nchunks, g_len = staged_next
            staged_next = None
            groups = nchunks // g_len
            rng, sub = jax.random.split(rng)
            wpc = raw_words / max(nchunks, 1)
            loss_sums, pair_cnts = [], []
            for g, (wc_d, bc_d, hc_d) in enumerate(staged):
                if not upload_prefetch:
                    wc_d, bc_d, hc_d = put(wc_d), put(bc_d), put(hc_d)
                sub_g = (jax.random.fold_in(sub, g) if groups > 1
                         else sub)
                p0 = jnp.float32(processed_words + g * g_len * wpc)
                com = dict(lr=float(opt.lr),
                           min_lr=float(opt.min_lr),
                           total_words=float(total_words),
                           words_per_chunk=float(wpc), **stat)
                if mesh is not None:
                    L0, L1, l_, c_ = w2v_epoch_stream_dp(
                        L0, L1, wc_d, bc_d, hc_d,
                        sub_g, p0, dist, mesh=mesh, **com)
                else:
                    L0, L1, l_, c_ = w2v_epoch_stream(
                        L0, L1, wc_d, bc_d, hc_d, sub_g, p0, dist,
                        **com)
                loss_sums.append(l_)
                pair_cnts.append(c_)
            # every group is dispatched (async); generate AND STAGE
            # the next epoch's arrays now — the host numpy phase and
            # the ~72 MB upload both hide under the device compute;
            # the loss readback below is the sync point
            if i + 1 < opt.num_iters:
                staged_next = stage(host_phase())
            loss_sum = float(np.sum([np.asarray(x) for x in loss_sums]))
            pair_cnt = float(np.sum([np.asarray(x) for x in pair_cnts]))
            loss = loss_sum / max(pair_cnt, 1.0)
            processed_words += raw_words
            self.iteration_times.append(time.time() - start_t)
            self.logger.info(
                "Iteration %d: Loss %.5f (%d pairs) Elapsed %.3f secs"
                % (i + 1, loss, int(pair_cnt), time.time() - start_t))
            if training_callback is not None and callable(
                    training_callback):
                training_callback(i, {"train_loss": loss})
        self.L0 = np.ascontiguousarray(np.asarray(L0)[:, :d])
        self.L1 = np.ascontiguousarray(np.asarray(L1)[:, :d])
        self.logger.info(
            f"elapsed for full epochs: {time.time() - full_st:.2f} sec")
        return loss

    def train(self, training_callback: Optional[
            Callable[[int, Dict[str, float]], None]] = None) -> Dict[str, float]:
        assert self.data, "Data is not set"
        import jax
        import jax.numpy as jnp

        opt = self.opt
        V = int(self._vocab.size)
        if V == 0:
            self.logger.warning("Empty vocabulary; nothing to train.")
            return {}
        # sub-64-lane tables hit a slow XLA code path — store them
        # zero-padded on device, slice back on host sync (zero columns
        # are inert through the sigmoid update incl. max_step_norm;
        # sgd_kernels.resolve_stored_width has the measurements)
        d = int(opt.d)
        width = K.resolve_stored_width(d, int(opt.get("stored_width", 0)))
        L0_host = K.pad_cols(self.L0, width)
        L1_host = K.pad_cols(self.L1, width)
        # the serialized vocab keeps the reference-format int32 CDF;
        # the epoch samples from Walker-alias tables built from it
        # (searchsorted over a 500k-word CDF is pathological on TPU —
        # sgd_kernels.build_alias_table)
        dist_pair = K.build_alias_table(
            np.diff(np.asarray(self._vocab.dist, dtype=np.int64),
                    prepend=0))

        chunk = int(opt.get("batch_size") or 0)
        if chunk <= 0:
            # keep >=16 sequential steps per epoch so the megabatch
            # approximation stays close to the reference's sequential
            # updates (fewer, bigger batches can diverge at high lr)
            est_pairs = self._vocab.total_word_count * int(opt.window)
            chunk = 1 << max(12, min(18, int(np.log2(max(est_pairs
                                                         // 16, 1)))))
        # dp mesh opt-in (num_devices > 1): pair chunks shard on the
        # batch axis; the chunk width must divide evenly over the mesh
        mesh = self._select_dp_mesh(True, False)
        chunk_shard = None
        if mesh is None:
            L0 = jax.device_put(L0_host)
            L1 = jax.device_put(L1_host)
            dist = jax.device_put(dist_pair)
        else:
            from buffalo_tpu import parallelism
            from jax.sharding import NamedSharding, PartitionSpec
            repl = parallelism.replicated(mesh)
            chunk_shard = NamedSharding(mesh, PartitionSpec(None, "d"))
            chunk = -(-chunk // mesh.size) * mesh.size
            L0 = jax.device_put(L0_host, repl)
            L1 = jax.device_put(L1_host, repl)
            dist = jax.device_put(dist_pair, repl)
        rng_np = np.random.default_rng(int(opt.random_seed))
        rng = jax.random.PRNGKey(int(opt.random_seed))

        total_words = float(self._vocab.total_word_count) * opt.num_iters
        processed_words = 0.0
        statics = dict(num_negatives=int(opt.num_negative_samples),
                       vocab_size=V,
                       compute_loss=bool(opt.compute_loss_on_training),
                       max_step_norm=float(opt.get("max_step_norm", 0.1)))
        loss = None
        full_st = time.time()
        self.iteration_times = []  # per-epoch train seconds
        raw_words = float(self._vocab.total_word_count)

        pair_gen = str(opt.get("pair_gen", "auto"))
        # auto = device expansion on single-device TPU runs; the mesh
        # path stays opt-in (pair_gen="device" uses
        # w2v_epoch_stream_dp: position-axis sharded chunks)
        use_stream = pair_gen == "device" or (
            pair_gen == "auto" and mesh is None
            and jax.default_backend() == "tpu")
        if use_stream:
            loss = self._train_stream(L0, L1, dist, rng, rng_np,
                                      statics, d, full_st,
                                      training_callback, mesh=mesh)
            return {"train_loss": loss} if loss is not None else {}
        next_pairs = None  # host pair prefetch, one epoch ahead
        for i in range(opt.num_iters):
            start_t = time.time()
            if next_pairs is None:
                next_pairs = self._generate_pairs(rng_np)
            inputs, targets, n_words = next_pairs
            next_pairs = None
            n_pairs = len(inputs)
            # round the chunk count up to a multiple of 4: subsampling
            # jitters n_pairs a little every epoch, and a changed scan
            # length would recompile the fused epoch program
            nchunks = -(-max(1, -(-n_pairs // chunk)) // 4) * 4
            pad = nchunks * chunk - n_pairs
            if pad:  # pad tail with dropped sentinel
                inputs = np.concatenate(
                    [inputs, np.full(pad, V, dtype=np.int32)])
                targets = np.concatenate(
                    [targets, np.full(pad, V, dtype=np.int32)])
            # bound the per-dispatch scan length: the ~225-chunk
            # whole-epoch program at the full KakaoBrunch shape took
            # the remote TPU compiler/worker down (same failure class
            # as the deleted IVF fused merge), while a 32-chunk body
            # compiles and runs fine (benchmark/microbench_w2v_crash).
            # Epochs longer than the cap run as ceil(n/G) dispatches
            # of ONE shared compiled shape (tail sentinel-padded),
            # carrying the tables and advancing the lr progress across
            # groups — semantics unchanged, ~25 ms dispatch overhead
            # per extra group.
            G = int(opt.get("max_chunks_per_dispatch", 32))
            if nchunks > G:
                nchunks_pad = -(-nchunks // G) * G
                extra = (nchunks_pad - nchunks) * chunk
                if extra:
                    inputs = np.concatenate(
                        [inputs, np.full(extra, V, dtype=np.int32)])
                    targets = np.concatenate(
                        [targets, np.full(extra, V, dtype=np.int32)])
                nchunks = nchunks_pad
                g_len = G
            else:
                g_len = nchunks
            groups = nchunks // g_len
            rng, sub = jax.random.split(rng)
            # lr decay advances by RAW corpus words, as the reference's
            # progress thread does (w2v.cc:340 counts job.size before
            # subsampling) — counting kept words would end the schedule
            # above min_lr by the kept fraction
            wpc = raw_words / max(nchunks, 1)
            resident = (len(inputs) * 8) <= int(
                opt.get("resident_mb", 4096)) * 1024 * 1024
            if resident:
                if mesh is not None:
                    from buffalo_tpu.ops.w2v_kernels import w2v_epoch_dp
                inputs2 = inputs.reshape(nchunks, chunk)
                targets2 = targets.reshape(nchunks, chunk)
                loss_sums, pair_cnts = [], []
                for g in range(groups):
                    sl = slice(g * g_len, (g + 1) * g_len)
                    sub_g = (jax.random.fold_in(sub, g) if groups > 1
                             else sub)
                    p0 = jnp.float32(processed_words + g * g_len * wpc)
                    if mesh is not None:
                        L0, L1, l_, c_ = w2v_epoch_dp(
                            L0, L1,
                            jax.device_put(inputs2[sl], chunk_shard),
                            jax.device_put(targets2[sl], chunk_shard),
                            dist, sub_g, p0, mesh=mesh,
                            lr=float(opt.lr), min_lr=float(opt.min_lr),
                            total_words=float(total_words),
                            words_per_chunk=float(wpc), **statics)
                    else:
                        L0, L1, l_, c_ = w2v_epoch(
                            L0, L1,
                            jax.device_put(inputs2[sl]),
                            jax.device_put(targets2[sl]),
                            dist, sub_g, p0,
                            lr=float(opt.lr), min_lr=float(opt.min_lr),
                            total_words=float(total_words),
                            words_per_chunk=float(wpc), **statics)
                    loss_sums.append(l_)
                    pair_cnts.append(c_)
                # every group is dispatched (async); generate the NEXT
                # epoch's pairs now, overlapping the device compute —
                # the loss readback below is the sync point.  Only in
                # the resident branch: the streaming fallback exists
                # for bounded host memory, and the prefetch would hold
                # two epochs of pairs.
                if i + 1 < opt.num_iters:
                    next_pairs = self._generate_pairs(rng_np)
                loss_sum = float(np.sum([np.asarray(x)
                                         for x in loss_sums]))
                pair_cnt = float(np.sum([np.asarray(x)
                                         for x in pair_cnts]))
                loss = loss_sum / max(pair_cnt, 1.0)
            else:
                # streaming fallback: one dispatch per pair chunk with
                # host-side lr decay (the reference's bounded-memory
                # job-queue contract); loss scalars stay on device
                # until the epoch ends
                from buffalo_tpu.ops.w2v_kernels import w2v_step
                losses, counts = [], []
                for ci in range(nchunks):
                    sl = slice(ci * chunk, (ci + 1) * chunk)
                    progress = min(
                        (processed_words + ci * wpc)
                        / max(total_words, 1.0), 1.0)
                    lr_t = max(opt.lr - (opt.lr - opt.min_lr) * progress,
                               opt.min_lr)
                    L0, L1, l_, c_ = w2v_step(
                        L0, L1, jax.device_put(inputs[sl]),
                        jax.device_put(targets[sl]), dist,
                        jax.random.fold_in(sub, ci),
                        jnp.float32(lr_t), **statics)
                    losses.append(l_)
                    counts.append(c_)
                loss_sum = float(np.sum([np.asarray(x) for x in losses]))
                pair_cnt = float(np.sum([np.asarray(x) for x in counts]))
                loss = loss_sum / max(pair_cnt, 1.0)
            processed_words += raw_words
            self.iteration_times.append(time.time() - start_t)
            self.logger.info(
                "Iteration %d: Loss %.5f (%d pairs) Elapsed %.3f secs"
                % (i + 1, loss, n_pairs, time.time() - start_t))
            if training_callback is not None and callable(training_callback):
                training_callback(i, {"train_loss": loss})
        self.L0 = np.ascontiguousarray(np.asarray(L0)[:, :d])
        self.L1 = np.ascontiguousarray(np.asarray(L1)[:, :d])
        self.logger.info(
            f"elapsed for full epochs: {time.time() - full_st:.2f} sec")
        return {"train_loss": loss} if loss is not None else {}

    # --------------------------------------------------------------- access
    def _get_data(self):
        data = super()._get_data()
        data.extend([("opt", self.opt), ("L0", self.L0),
                     ("_vocab", self._vocab)])
        return data

    def get_evaluation_metrics(self):
        return []
