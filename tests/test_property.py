"""Property-based tests (hypothesis) over the pure kernels — beyond
the reference's golden-vector-only strategy (SURVEY.md §5): these
check INVARIANTS on randomized inputs, with deterministic shrinking.
No Ray needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# BIO tagging: encode -> decode round-trip
# ---------------------------------------------------------------------------

ENT_TYPES = ["PER", "ORG", "LOC"]


@st.composite
def bio_docs(draw):
    """Random token/BIO-tag sequences built from well-formed entities
    separated by >=1 O tokens (so the round-trip is exact)."""
    n_ents = draw(st.integers(0, 4))
    tokens, tags, spans = [], [], []
    for _ in range(n_ents):
        gap = draw(st.integers(1, 3))
        tokens += [f"o{len(tokens)+i}" for i in range(gap)]
        tags += ["O"] * gap
        t = draw(st.sampled_from(ENT_TYPES))
        length = draw(st.integers(1, 3))
        start = len(tokens)
        tokens += [f"e{start+i}" for i in range(length)]
        tags += [f"B-{t}"] + [f"I-{t}"] * (length - 1)
        spans.append((t, start, start + length))
    tail = draw(st.integers(0, 2))
    tokens += [f"t{i}" for i in range(tail)]
    tags += ["O"] * tail
    return tokens, tags, spans


@given(bio_docs())
@settings(max_examples=200, deadline=None)
def test_bio_roundtrip_property(doc):
    from rex_ray.functions.tagging import get_entities_from_tags

    tokens, tags, spans = doc
    ents = get_entities_from_tags(tokens, tags, join=" ")
    got = [(t, s, e) for _surface, t, (s, e) in ents]
    assert got == spans


# ---------------------------------------------------------------------------
# piecewise mask: partition property
# ---------------------------------------------------------------------------

@given(
    st.integers(2, 40).flatmap(
        lambda n: st.tuples(
            st.just(n), st.integers(0, n - 1), st.integers(0, n - 1),
            st.integers(0, 10),
        )
    )
)
@settings(max_examples=200, deadline=None)
def test_piecewise_mask_partitions(args):
    from rex_ray.functions.mask import construct_piecewise_mask

    seq_len, h, t, extra = args
    max_len = seq_len + extra
    m = np.asarray(construct_piecewise_mask(h, t, seq_len, max_len))
    lo, hi = min(h, t), max(h, t)
    # segments partition [0, seq_len); padding is 0
    assert (m[:lo] == 1).all()
    assert (m[lo:hi] == 2).all()
    assert (m[hi:seq_len] == 3).all()
    assert (m[seq_len:] == 0).all()


# ---------------------------------------------------------------------------
# span pairing: every start is claimed, spans are valid
# ---------------------------------------------------------------------------

@given(st.lists(st.sampled_from([0, 1]), min_size=1, max_size=30), st.data())
@settings(max_examples=200, deadline=None)
def test_span_pairs_validity(head, data):
    from rex_ray.functions.span import find_closest_span_pairs

    tail = data.draw(
        st.lists(st.sampled_from([0, 1]), min_size=len(head), max_size=len(head))
    )
    pairs = find_closest_span_pairs(head, tail)
    for s, e in pairs:
        assert 0 <= s <= e < len(head)
        assert head[s] == 1 or tail[e] == 1
    # every start with an available end at/after it is claimed
    starts = {s for s, _ in pairs}
    for i, h in enumerate(head):
        if h == 1 and any(t == 1 for t in tail[i:]):
            assert i in starts


# ---------------------------------------------------------------------------
# P/R/F1 arithmetic: bounds and exact-match identity
# ---------------------------------------------------------------------------

@given(st.integers(0, 50), st.integers(0, 50), st.integers(0, 50))
@settings(max_examples=200, deadline=None)
def test_prf1_bounds(tp, fp, fn):
    from rex_ray.functions.metrics import prf1_from_counts

    m = prf1_from_counts(tp, fp, fn)
    assert 0.0 <= m["p"] <= 1.0 and 0.0 <= m["r"] <= 1.0
    assert 0.0 <= m["f1"] <= 1.0
    if fp == 0 and fn == 0 and tp > 0:
        assert m["f1"] == 1.0
    if tp == 0:
        assert m["f1"] == 0.0


# ---------------------------------------------------------------------------
# session windows: kernel-level equivalence with a brute-force scan
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_session_assignment_matches_bruteforce(ts_list):
    gap = 100
    ts = np.sort(np.asarray(ts_list))
    new_session = np.empty(len(ts), dtype=bool)
    new_session[0] = True
    new_session[1:] = np.diff(ts) > gap
    sid = np.cumsum(new_session) - 1
    # brute force
    cur, brute = 0, [0]
    for i in range(1, len(ts)):
        if ts[i] - ts[i - 1] > gap:
            cur += 1
        brute.append(cur)
    assert sid.tolist() == brute


# ---------------------------------------------------------------------------
# minhash: jaccard estimate correlates with exact jaccard
# ---------------------------------------------------------------------------

@given(
    st.lists(st.integers(0, 30), min_size=3, max_size=40, unique=True),
    st.lists(st.integers(0, 30), min_size=3, max_size=40, unique=True),
)
@settings(max_examples=50, deadline=None)
def test_minhash_estimate_close(a_ids, b_ids):
    from rex_ray.functions.hashing import (
        MinHasher,
        jaccard,
        minhash_jaccard_estimate,
    )

    a = {f"tok{i}" for i in a_ids}
    b = {f"tok{i}" for i in b_ids}
    mh = MinHasher(num_perm=128)
    est = minhash_jaccard_estimate(mh.signature(a), mh.signature(b))
    exact = jaccard(a, b)
    assert abs(est - exact) < 0.35  # 128 perms: loose but sound bound
    if a == b:
        assert est == 1.0


@given(
    st.lists(st.integers(0, 9), min_size=8, max_size=60),
    st.lists(st.integers(0, 9), min_size=8, max_size=60),
    st.integers(0, 40),
)
@settings(max_examples=60, deadline=None)
def test_winnowing_shared_run_guarantee(a_ids, b_ids, start):
    """Winnowing's core guarantee (Schleimer et al.): two docs sharing
    a token run of length >= w + k - 1 share at least one fingerprint
    HASH.  Build doc B by splicing a run from doc A into unrelated
    text."""
    from rex_ray.functions.hashing import md5_gram_hash, winnow

    k, w = 3, 4
    run_len = w + k - 1
    a_toks = [f"a{i}" for i in a_ids]
    if len(a_toks) < run_len:
        return
    s = min(start, len(a_toks) - run_len)
    run = a_toks[s : s + run_len]
    b_toks = [f"b{i}" for i in b_ids] + run + [f"c{i}" for i in b_ids]

    def fps(toks):
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        _, hs = winnow(md5_gram_hash(grams), w)
        return set(hs.tolist())

    assert fps(a_toks) & fps(b_toks)


@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=120),
    st.floats(0.1, 0.99),
)
@settings(max_examples=60, deadline=None)
def test_prefix_filter_bound_sound(ids, threshold):
    """For any set and threshold, removing the prefix from A must make
    it impossible for a disjoint-prefix B to reach the threshold: any
    B with jaccard(A, B) >= t shares an element with A's prefix."""
    import numpy as np

    from rex_ray.functions.hashing import _stable_hash64
    from rex_ray.stages.dedup import _prefix_len

    A = sorted({f"s{i}" for i in ids})
    hv = _stable_hash64(A).view(np.int64)
    order = np.argsort(hv, kind="stable")
    p = _prefix_len(len(A), threshold)
    prefix = {A[i] for i in order[:p]}
    rest = set(A) - prefix
    # the worst adversary keeps ALL non-prefix elements and adds
    # nothing: its jaccard is the max achievable without touching the
    # prefix, and must be strictly below the threshold
    if rest:
        j = len(rest) / len(A)
        assert j < threshold


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 200)),
        min_size=0, max_size=60, unique_by=lambda t: t[0],
    ),
    st.integers(2, 9),
)
@settings(max_examples=20, deadline=None)
def test_prefix_sum_bucket_invariance(rows, num_buckets):
    """The distributed scan's result is independent of bucket count and
    row order: always equals the sequential cumsum over sorted keys."""
    import ray.data as rd

    from rex_ray.stages.pack import ordered_prefix_sum

    if not rows:
        return
    ds = rd.from_items(
        [{"doc_id": k, "n_tokens": v} for k, v in rows]
    )
    got = {
        r["doc_id"]: r["prefix"]
        for r in ordered_prefix_sum(
            ds, "doc_id", "n_tokens", num_buckets=num_buckets
        ).take_all()
    }
    run = 0
    for k, v in sorted(rows):
        assert got[k] == run
        run += v


# ---------------------------------------------------------------------------
# chunker: coverage + reconstruction invariants (pure kernel logic)
# ---------------------------------------------------------------------------

@given(
    st.integers(1, 60),          # n tokens
    st.integers(2, 12),          # chunk size
    st.integers(0, 8),           # overlap (clamped below chunk)
)
@settings(max_examples=60, deadline=None)
def test_chunker_covers_every_token_once_per_stride(n, chunk, ov):
    """Every token appears in >=1 chunk; non-overlap prefixes
    concatenate back to the document; chunk ids are dense from 0."""
    import pandas as pd

    ov = min(ov, chunk - 1)
    stride = chunk - ov
    toks = [f"t{i}" for i in range(n)]

    # drive the batch fn directly (no Ray) — same code the stage runs
    from rex_ray.stages.textstats import chunk_documents

    class _FakeDS:
        def map_batches(self, fn, **kw):
            self.out = fn(pd.DataFrame(
                {"doc_id": [7], "text": [" ".join(toks)]}
            ))
            return self

    ds = _FakeDS()
    out = chunk_documents(ds, chunk_tokens=chunk, overlap=ov).out.to_pandas()
    assert out["chunk_id"].tolist() == list(range(len(out)))
    covered = set()
    for r in out.itertuples():
        got = r.chunk_text.split(" ")
        assert got == toks[r.start_tok - 1: r.start_tok - 1 + r.n_tokens]
        covered.update(range(r.start_tok - 1, r.start_tok - 1 + r.n_tokens))
    assert covered == set(range(n))
    # stride-prefix reconstruction
    rebuilt = []
    for r in out.itertuples():
        rebuilt.extend(r.chunk_text.split(" ")[:stride])
    assert rebuilt == toks


@given(st.lists(st.integers(0, 5), min_size=2, max_size=30))
@settings(max_examples=40, deadline=None)
def test_micronat_terms_order_independent(counts):
    """The micronat contract: per-position int terms are identical
    whatever batch the position lands in (permutation invariance of
    the scoring kernel)."""
    import numpy as np

    from rex_ray.functions import hashing as H
    from rex_ray.stages.textstats import _micronat_terms

    grams = [f"a{i} b{i}" for i in range(len(counts))]
    hist = [f"a{i}" for i in range(len(counts))]
    gh = H.md5_hash64_batch(grams)
    uh = H.md5_hash64_batch(hist)
    o = np.argsort(gh)
    ou = np.argsort(uh)
    model = (
        (gh[o], np.asarray(counts, dtype=np.int64)[o]),
        (uh[ou], (np.asarray(counts, dtype=np.int64) + 1)[ou], 17),
    )
    hv, hu = H.md5_hash64_batch(grams), H.md5_hash64_batch(hist)
    full = _micronat_terms(hv, hu, model)
    perm = np.random.default_rng(0).permutation(len(grams))
    assert (_micronat_terms(hv[perm], hu[perm], model) == full[perm]).all()


# ---------------------------------------------------------------------------
# BPE encode: list-merge semantics vs the oracle's boundary-replace,
# rejoin invariant
# ---------------------------------------------------------------------------

@st.composite
def bpe_cases(draw):
    alpha = "abco"
    word = draw(st.text(alphabet=alpha, min_size=0, max_size=12))
    n_merges = draw(st.integers(1, 5))
    merges, vocab = [], list(alpha)
    for _ in range(n_merges):
        a = draw(st.sampled_from(vocab))
        b = draw(st.sampled_from(vocab))
        merges.append((a, b))
        if a + b not in vocab:
            vocab.append(a + b)
    return word, merges


def _list_merge(word, merges):
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


@given(bpe_cases())
@settings(max_examples=150, deadline=None)
def test_bpe_boundary_replace_equals_list_merge(case):
    """The SQL oracle's doubled-boundary string replace is the same
    function as the token-list merge loop, for ANY merge list —
    including a==b self-merges, chained merges and overlap runs."""
    word, merges = case
    toks = _list_merge(word, merges)

    s = "||" + "".join(c + "||" for c in word)
    for a, b in merges:
        s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
    got = [t for t in s.replace("||", " ").strip().split(" ") if t] \
        if word else []
    assert got == toks
    # merging never loses or reorders characters
    assert "".join(toks) == word


# ---------------------------------------------------------------------------
# BMES render -> parse -> decode round trip
# ---------------------------------------------------------------------------

@st.composite
def typed_tokens(draw):
    n = draw(st.integers(0, 12))
    types = [draw(st.sampled_from(["", "X", "Y"])) for _ in range(n)]
    toks = [f"t{i}" for i in range(n)]
    return toks, types


@given(typed_tokens())
@settings(max_examples=150, deadline=None)
def test_bmes_render_decode_recovers_runs(case):
    """render_bmes_tags -> parse_bmes_lines -> get_entities_from_tags
    recovers exactly the maximal same-type runs."""
    from rex_ray.functions.tagging import get_entities_from_tags
    from rex_ray.sources.ingest import parse_bmes_lines, render_bmes_tags

    toks, types = case
    tags = render_bmes_tags(toks, types)
    lines = [f"{t} {g}" for t, g in zip(toks, tags)] + [""]
    docs = parse_bmes_lines(lines, shard="p")
    ents = []
    for d in docs:
        ents += get_entities_from_tags(d["tokens"], d["ner_tags"], join=" ")

    want = []
    i = 0
    while i < len(toks):
        if types[i]:
            j = i
            while j + 1 < len(toks) and types[j + 1] == types[i]:
                j += 1
            want.append(
                (" ".join(toks[i: j + 1]), types[i], (i, j + 1))
            )
            i = j + 1
        else:
            i += 1
    assert ents == want


# ---------------------------------------------------------------------------
# Misra-Gries sharded merge: the candidate-superset guarantee
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(0, 25), min_size=1, max_size=400),
    st.integers(2, 12),
    st.integers(1, 6),
)
@settings(max_examples=200, deadline=None)
def test_mg_sharded_merge_superset(stream, k, n_shards):
    """Simulate heavy_hitter_ngrams' exact dataflow in pure pandas:
    per-shard value_counts + one MG compress, pointwise sum across
    shards, one global compress.  Invariants: (a) <= k survivors;
    (b) every item with true count > total/k survives (the superset
    guarantee the exact verify pass relies on); (c) every surviving
    estimate underestimates (never exceeds) the true count."""
    import pandas as pd

    from rex_ray.stages.textstats import _mg_compress

    items = pd.Series([f"x{v}" for v in stream])
    total = len(items)
    true = items.value_counts()

    shard = total // n_shards + 1
    summed = pd.Series(dtype="int64")
    for s in range(n_shards):
        chunk = items.iloc[s * shard: (s + 1) * shard]
        if not len(chunk):
            continue
        part = _mg_compress(chunk.value_counts(), k)
        summed = summed.add(part, fill_value=0)
    summed = summed.sort_values(ascending=False).astype("int64")
    survivors = _mg_compress(summed, k)

    assert len(survivors) <= k
    heavy = true[true * k > total]
    assert set(heavy.index) <= set(survivors.index)
    for g, est in survivors.items():
        assert est <= true[g]
