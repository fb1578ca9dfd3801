"""SGD-kernel unit tests: bloom filter guarantees, negative sampling,
deferred-optimizer math."""
import numpy as np

from buffalo_tpu.ops import sgd_kernels as K


def _toy_csr(num_users=50, num_items=40, seed=0):
    rng = np.random.default_rng(seed)
    deg = rng.integers(1, 12, num_users)
    indptr = np.zeros(num_users + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    keys = rng.integers(0, num_items, int(indptr[-1])).astype(np.int32)
    return indptr, keys


def test_bloom_never_false_negative():
    import jax

    indptr, keys = _toy_csr()
    words, log2 = K.build_bloom(indptr, keys)
    words_d = jax.device_put(words)
    users = np.repeat(np.arange(len(indptr) - 1, dtype=np.int32),
                      np.diff(indptr))
    hit = np.asarray(K.bloom_contains(words_d, log2, users, keys))
    assert hit.all(), "a true positive was not flagged seen"


def test_bloom_false_positive_rate_low():
    import jax

    indptr, keys = _toy_csr(num_users=200, num_items=5000, seed=1)
    words, log2 = K.build_bloom(indptr, keys)
    words_d = jax.device_put(words)
    rng = np.random.default_rng(2)
    users = rng.integers(0, 200, 20000).astype(np.int32)
    items = rng.integers(0, 5000, 20000).astype(np.int32)
    # exact membership for comparison
    seen = set()
    for u in range(200):
        for k in keys[indptr[u]:indptr[u + 1]]:
            seen.add((u, int(k)))
    flagged = np.asarray(K.bloom_contains(words_d, log2, users, items))
    truth = np.array([(int(u), int(i)) in seen
                      for u, i in zip(users, items)])
    assert flagged[truth].all()                      # no false negatives
    fp = float(np.mean(flagged[~truth]))
    assert fp < 0.05, f"false positive rate too high: {fp}"


def test_verified_negatives_avoid_positives():
    import jax

    indptr, keys = _toy_csr(num_users=30, num_items=500, seed=3)
    words, log2 = K.build_bloom(indptr, keys)
    words_d = jax.device_put(words)
    users = np.repeat(np.arange(30, dtype=np.int32), 64)
    neg = np.asarray(K.sample_verified_negatives(
        jax.random.PRNGKey(0), jax.device_put(users), 500, None,
        words_d, log2, True))
    seen = set()
    for u in range(30):
        for k in keys[indptr[u]:indptr[u + 1]]:
            seen.add((u, int(k)))
    bad = sum((int(u), int(n)) in seen for u, n in zip(users, neg))
    # sparse data: the probability all 4 attempts hit positives is ~0
    assert bad == 0


def test_bpr_epoch_matches_streaming_steps():
    """Fused epoch (deferred adagrad) == per-chunk accumulate + apply."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    U, I, D, N = 40, 30, 8, 64
    indptr, keys = _toy_csr(U, I, seed=5)
    words, log2 = K.build_bloom(indptr, keys)
    nnz = int(indptr[-1])
    users = np.repeat(np.arange(U, dtype=np.int32), np.diff(indptr))
    nchunks = -(-nnz // N)
    pad = nchunks * N - nnz
    users_p = np.concatenate([users, np.zeros(pad, np.int32)])
    items_p = np.concatenate([keys, np.zeros(pad, np.int32)])

    P0 = rng.normal(size=(U, D)).astype(np.float32) * 0.1
    Q0 = rng.normal(size=(I, D)).astype(np.float32) * 0.1
    Qb0 = np.zeros(I, np.float32)
    bloom = jax.device_put(words)
    cum = jnp.zeros((1,), jnp.float32)
    statics = dict(num_items=I, num_negatives=1, use_bias=True,
                   update_i=True, update_j=True, verify_neg=True,
                   use_cum_table=False, bloom_log2=log2)

    # fused
    opt_state = {"mP": jnp.zeros((U, D)), "vP": jnp.zeros((U, D)),
                 "mQ": jnp.zeros((I, D)), "vQ": jnp.zeros((I, D)),
                 "mQb": jnp.zeros(I), "vQb": jnp.zeros(I)}
    Pf, Qf, Qbf, _ = K.bpr_epoch(
        jax.device_put(P0), jax.device_put(Q0), jax.device_put(Qb0),
        opt_state,
        jax.device_put(users_p.reshape(nchunks, N)),
        jax.device_put(items_p.reshape(nchunks, N)),
        bloom, cum, jax.random.PRNGKey(7), jnp.int32(0),
        optimizer="adagrad", per_coordinate_normalize=False, lr=0.05,
        min_lr=1e-4, beta1=0.9, beta2=0.999, reg_u=0.02, reg_i=0.02,
        reg_j=0.02, reg_b=0.02, num_valid=nnz, total_samples=float(nnz),
        **statics)

    # streaming: same chunk order, same fold_in keys, masked tail
    P = jax.device_put(P0)
    Q = jax.device_put(Q0)
    Qb = jax.device_put(Qb0)
    gP, gQ, gQb = jnp.zeros((U, D)), jnp.zeros((I, D)), jnp.zeros(I)
    cP, cQ = jnp.zeros(U), jnp.zeros(I)
    key = jax.random.PRNGKey(7)
    for c in range(nchunks):
        u = users_p[c * N:(c + 1) * N]
        pos = items_p[c * N:(c + 1) * N]
        valid = (np.arange(N) + c * N) < nnz
        sub = jax.random.fold_in(key, c)
        # reproduce the masked accumulate by zeroing padded logits:
        # run accumulate on the raw chunk then subtract the padded
        # contribution — instead simply skip the tail-only compare by
        # using full chunks except the last, which we recompute by hand
        gP, gQ, gQb, cP, cQ = K.bpr_accumulate_step(
            P, Q, Qb, gP, gQ, gQb, cP, cQ,
            jax.device_put(u), jax.device_put(pos), bloom, cum, sub,
            per_coordinate_normalize=False, **statics)
        if not valid.all():
            # remove the padded samples' gradient contribution
            neg = K.sample_verified_negatives(
                sub, jax.device_put(u), I, None, bloom, log2, True)
            p_, qi, qj, logit = K._bpr_forward(
                P, Q, Qb, jax.device_put(u), jax.device_put(pos),
                neg, True)
            w = jnp.asarray((~valid).astype(np.float32))
            lg = logit * w
            gP = gP.at[u].add(-lg[:, None] * (qi - qj))
            gQ = gQ.at[pos].add(-lg[:, None] * p_)
            gQ = gQ.at[np.asarray(neg)].add(lg[:, None] * p_)
            gQb = gQb.at[pos].add(-lg)
            gQb = gQb.at[np.asarray(neg)].add(lg)
    P, gP, mP, vP = K.apply_deferred_update(
        P, gP, jnp.zeros((U, D)), jnp.zeros((U, D)), cP, 0,
        optimizer="adagrad", lr=0.05, beta1=0.9, beta2=0.999, reg=0.02,
        per_coordinate_normalize=False)
    Q, gQ, mQ, vQ = K.apply_deferred_update(
        Q, gQ, jnp.zeros((I, D)), jnp.zeros((I, D)), cQ, 0,
        optimizer="adagrad", lr=0.05, beta1=0.9, beta2=0.999, reg=0.02,
        per_coordinate_normalize=False)
    Qb, gQb, mQb, vQb = K.apply_deferred_update(
        Qb, gQb, jnp.zeros(I), jnp.zeros(I), cQ, 0,
        optimizer="adagrad", lr=0.05, beta1=0.9, beta2=0.999, reg=0.02,
        per_coordinate_normalize=False)
    np.testing.assert_allclose(np.asarray(Pf), np.asarray(P),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Qf), np.asarray(Q),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Qbf), np.asarray(Qb),
                               rtol=2e-4, atol=2e-5)


def test_bpr_epoch_pcn_counts_match_streaming():
    """per_coordinate_normalize counting parity (bpr.cc:175-182): the
    fused epoch must count P/positive once per PAIR and the negative
    per (pair x negative) — exactly like bpr_accumulate_step
    (regression: repeated u/pos overcounted by num_negatives)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    U, I, D, N = 32, 25, 4, 32
    indptr, keys = _toy_csr(U, I, seed=11)
    words, log2 = K.build_bloom(indptr, keys)
    users = np.repeat(np.arange(U, dtype=np.int32), np.diff(indptr))
    nnz = (len(users) // N) * N  # trim: no padded tail
    users, keys = users[:nnz], keys[:nnz]
    nchunks = nnz // N

    P0 = rng.normal(size=(U, D)).astype(np.float32) * 0.1
    Q0 = rng.normal(size=(I, D)).astype(np.float32) * 0.1
    Qb0 = np.zeros(I, np.float32)
    bloom = jax.device_put(words)
    cum = jnp.zeros((1,), jnp.float32)
    statics = dict(num_items=I, num_negatives=2, use_bias=True,
                   update_i=True, update_j=True, verify_neg=True,
                   use_cum_table=False, bloom_log2=log2)

    opt_state = {"mP": jnp.zeros((U, D)), "vP": jnp.zeros((U, D)),
                 "mQ": jnp.zeros((I, D)), "vQ": jnp.zeros((I, D)),
                 "mQb": jnp.zeros(I), "vQb": jnp.zeros(I)}
    Pf, Qf, Qbf, _ = K.bpr_epoch(
        jax.device_put(P0), jax.device_put(Q0), jax.device_put(Qb0),
        opt_state,
        jax.device_put(users.reshape(nchunks, N)),
        jax.device_put(keys.reshape(nchunks, N)),
        bloom, cum, jax.random.PRNGKey(3), jnp.int32(0),
        optimizer="adagrad", per_coordinate_normalize=True, lr=0.05,
        min_lr=1e-4, beta1=0.9, beta2=0.999, reg_u=0.02, reg_i=0.02,
        reg_j=0.02, reg_b=0.02, num_valid=nnz, total_samples=float(nnz),
        **statics)

    P, Q, Qb = (jax.device_put(P0), jax.device_put(Q0),
                jax.device_put(Qb0))
    gP, gQ, gQb = jnp.zeros((U, D)), jnp.zeros((I, D)), jnp.zeros(I)
    cP, cQ = jnp.zeros(U), jnp.zeros(I)
    key = jax.random.PRNGKey(3)
    for c in range(nchunks):
        gP, gQ, gQb, cP, cQ = K.bpr_accumulate_step(
            P, Q, Qb, gP, gQ, gQb, cP, cQ,
            jax.device_put(users[c * N:(c + 1) * N]),
            jax.device_put(keys[c * N:(c + 1) * N]),
            bloom, cum, jax.random.fold_in(key, c),
            per_coordinate_normalize=True, **statics)
    com = dict(optimizer="adagrad", lr=0.05, beta1=0.9, beta2=0.999,
               per_coordinate_normalize=True)
    Ps, _, _, _ = K.apply_deferred_update(
        P, gP, jnp.zeros((U, D)), jnp.zeros((U, D)), cP, 0,
        reg=0.02, **com)
    Qs, _, _, _ = K.apply_deferred_update(
        Q, gQ, jnp.zeros((I, D)), jnp.zeros((I, D)), cQ, 0,
        reg=0.02, **com)
    np.testing.assert_allclose(np.asarray(Pf), np.asarray(Ps),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Qf), np.asarray(Qs),
                               rtol=1e-5, atol=1e-6)


def test_exhausted_verify_returns_sentinel():
    """A user who has seen the whole catalog: every attempt is flagged
    seen, the sample returns the num_items sentinel, and the forward
    zeroes its gradient — a positive is never trained as a negative."""
    import jax
    import jax.numpy as jnp

    num_items = 16
    indptr = np.array([0, num_items], np.int64)
    keys = np.arange(num_items, dtype=np.int32)
    words, log2 = K.build_bloom(indptr, keys)
    users = np.zeros(64, np.int32)
    neg = np.asarray(K.sample_verified_negatives(
        jax.random.PRNGKey(1), jax.device_put(users), num_items, None,
        jax.device_put(words), log2, True))
    assert (neg == num_items).all()

    P = jnp.ones((1, 4)); Q = jnp.ones((num_items, 4))
    Qb = jnp.zeros(num_items)
    _, _, _, logit = K._bpr_forward(
        P, Q, Qb, jnp.asarray(users), jnp.zeros(64, jnp.int32),
        jnp.asarray(neg), True)
    assert np.all(np.asarray(logit) == 0.0)


def test_alias_table_matches_weights():
    """Walker-alias sampling must reproduce the weight distribution
    (it replaced the TPU-pathological searchsorted CDF draw) and never
    emit zero-weight buckets."""
    import jax
    import jax.numpy as jnp

    from buffalo_tpu.ops.sgd_kernels import (build_alias_table,
                                             draw_from_alias)

    rng = np.random.default_rng(0)
    w = rng.random(1000) ** 3 + 1e-6
    prob, alias = build_alias_table(w)
    assert prob.dtype == np.float32 and alias.dtype == np.int32
    n = 200_000
    draws = draw_from_alias(jax.random.PRNGKey(0), (n,),
                            jnp.asarray(prob), jnp.asarray(alias))
    freq = np.bincount(np.asarray(draws), minlength=1000) / n
    p = w / w.sum()
    sigma = np.sqrt(p * (1 - p) / n)
    assert (np.abs(freq - p) < 6 * sigma + 1e-4).all()

    prob2, alias2 = build_alias_table(np.array([0.0, 1.0, 0.0, 2.0]))
    d2 = draw_from_alias(jax.random.PRNGKey(1), (50_000,),
                         jnp.asarray(prob2), jnp.asarray(alias2))
    c2 = np.bincount(np.asarray(d2), minlength=4)
    assert c2[0] == 0 and c2[2] == 0
    assert abs(c2[3] / 50_000 - 2 / 3) < 0.01


def test_draw_negatives_popularity_uses_alias_pair():
    """draw_negatives with a (prob, alias) pair must sample the CDF's
    popularity distribution (driver contract: CDF stays the serialized
    format, the device draw rides the alias tables)."""
    import jax
    import jax.numpy as jnp

    from buffalo_tpu.ops.sgd_kernels import (build_alias_table,
                                             draw_negatives)

    counts = np.array([100, 10, 1, 50, 0, 25], dtype=np.float64)
    cum = np.cumsum(counts)
    cum /= cum[-1]
    cdf = (cum * 0x7FFFFFFF).astype(np.int32)     # reference format
    pair = build_alias_table(np.diff(cdf.astype(np.int64), prepend=0))
    n = 120_000
    draws = draw_negatives(jax.random.PRNGKey(2), (n,), 6,
                           (jnp.asarray(pair[0]), jnp.asarray(pair[1])))
    freq = np.bincount(np.asarray(draws), minlength=6) / n
    p = counts / counts.sum()
    assert freq[4] == 0.0
    np.testing.assert_allclose(freq, p, atol=0.01)
