"""Formula-level validation of the round-7 evaluation operators.

The driver's Spark-vs-DuckDB hash gate proves the two ENGINES agree, but
both sides implement the same closed form — a shared-formula bug would
sail through. These tests run the registered ORACLE SQL on small synthetic
tables in DuckDB and compare against independent brute-force reference
implementations (sequential PAVA, O(n^2) AUC pair counting, a direct
log-rank loop, textbook Fleiss kappa), so the formula itself is pinned,
not just its cross-engine determinism.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from bloom_filters_count_min_sketch_spark_streaming_spark.plans import registry

registry.load_all_query_modules()


def _con_with(table: str, columns: dict) -> duckdb.DuckDBPyConnection:
    import pandas as pd

    con = duckdb.connect()
    df = pd.DataFrame(columns)
    con.register("_src", df)
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM _src")
    return con


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_isotonic_oracle_matches_sequential_pava(seed):
    """The max-min closed form in the isotonic oracle must equal classic
    sequential pool-adjacent-violators on random binned data."""
    rng = _rng(seed)
    n = 4000
    score = rng.integers(0, 500, n)
    # correlation between score and label, with noise
    y = (rng.random(n) < (0.2 + 0.6 * score / 500)).astype(int)
    lang = np.where(y == 1, "en", "de")
    con = _con_with(
        "documents", {"n_chars": score, "lang": lang, "doc_id": np.arange(n)}
    )
    out = con.sql(registry.ORACLES["isotonic_calibration_pava"]).fetchdf()

    # reference: classic PAVA over the same 20 integer bins
    lo, hi = score.min(), score.max()
    bins = (score - lo) * 20 // (hi - lo + 1)
    uniq = np.unique(bins)
    w = np.array([(bins == b).sum() for b in uniq], dtype=float)
    r = np.array([y[bins == b].sum() for b in uniq], dtype=float) / w
    # pool adjacent violators
    vals = list(r)
    wts = list(w)
    idx = [[i] for i in range(len(vals))]
    i = 0
    while i < len(vals) - 1:
        if vals[i] > vals[i + 1] + 1e-15:
            tot = wts[i] + wts[i + 1]
            vals[i] = (vals[i] * wts[i] + vals[i + 1] * wts[i + 1]) / tot
            wts[i] = tot
            idx[i] = idx[i] + idx[i + 1]
            del vals[i + 1], wts[i + 1], idx[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    ref = np.empty(len(uniq))
    for v, members in zip(vals, idx):
        for m in members:
            ref[m] = v
    got = out.sort_values("bin")["iso_rate"].to_numpy()
    assert np.allclose(got, np.round(ref, 6), atol=2e-6), (got, ref)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_oracle_matches_pair_counting(seed):
    """Tie-averaged rank AUC == P(score_pos > score_neg) + 0.5*P(tie),
    counted over all pos x neg pairs."""
    rng = _rng(seed)
    n = 800
    score = rng.integers(0, 40, n)  # heavy ties
    y = (rng.random(n) < (0.2 + score / 80)).astype(int)
    lang = np.where(y == 1, "en", "fr")
    con = _con_with(
        "documents", {"n_chars": score, "lang": lang, "doc_id": np.arange(n)}
    )
    out = con.sql(registry.ORACLES["roc_auc_doc_length"]).fetchdf()
    pos = score[y == 1].astype(float)
    neg = score[y == 0].astype(float)
    gt = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    ref = (gt + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(out["auc"][0] - round(ref, 6)) <= 2e-6
    # Youden reference: maximize TPR - FPR over observed thresholds
    best = max(
        (((pos >= t).mean() - (neg >= t).mean()), -t) for t in np.unique(score)
    )
    assert abs(out["youden_j"][0] - round(best[0], 6)) <= 2e-6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_logrank_oracle_matches_direct_loop(seed):
    """The log-rank O1/E1/V sums must match a direct per-death-time loop
    over the same censored observations."""
    rng = _rng(seed)
    n_users = 300
    rows = []
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3600_000_000, "us")
    durs, groups, events = [], [], []
    eid = 0
    for u in range(n_users):
        rows.append((eid, t0, u, "signup", 0.0))
        eid += 1
        dur = int(rng.integers(1, 200))
        died = rng.random() < 0.6
        durs.append(dur)
        groups.append(u % 2)
        events.append(1 if died else 0)
        kind = "purchase" if died else "click"
        rows.append((eid, t0 + dur * hour, u, kind, 1.0))
        eid += 1
    import pandas as pd

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    con = duckdb.connect()
    con.register("_src", df)
    con.sql("CREATE VIEW events AS SELECT * FROM _src")
    out = con.sql(registry.ORACLES["logrank_test_user_parity"]).fetchdf()

    durs = np.array(durs)
    groups = np.array(groups)
    events = np.array(events)
    o1 = e1 = v = 0.0
    for t in sorted(set(durs[events == 1])):
        at = durs >= t
        d = ((durs == t) & (events == 1)).sum()
        d1 = ((durs == t) & (events == 1) & (groups == 1)).sum()
        n = at.sum()
        n1 = (at & (groups == 1)).sum()
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * ((n - n1) / n) * ((n - d) / (n - 1))
    chi2 = (o1 - e1) ** 2 / v
    assert out["o1"][0] == o1
    assert abs(out["e1"][0] - round(e1, 6)) <= 1e-4
    assert abs(out["chi2"][0] - round(chi2, 6)) <= 1e-3


@pytest.mark.parametrize("seed", [0, 1])
def test_fleiss_kappa_direct(seed):
    """Fleiss kappa oracle vs the textbook computation on random votes."""
    rng = _rng(seed)
    n = 500
    # construct docs whose three labeler votes we can predict exactly:
    # use pure-ASCII words so stopword/punct ratios are controlled
    texts, nchars, langs = [], [], []
    for _ in range(n):
        n_stop = int(rng.integers(0, 4))
        n_plain = int(rng.integers(4, 12))
        words = ["the"] * n_stop + ["data"] * n_plain
        t = " ".join(words)
        if rng.random() < 0.3:
            t += " !!!???..."
        texts.append(t)
        nchars.append(int(rng.integers(100, 1000)))
        langs.append("en" if rng.random() < 0.5 else "de")
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "_src",
        pd.DataFrame(
            {
                "doc_id": np.arange(n),
                "text": texts,
                "lang": langs,
                "source": "s",
                "n_chars": nchars,
            }
        ),
    )
    con.sql("CREATE VIEW documents AS SELECT * FROM _src")
    out = con.sql(registry.ORACLES["fleiss_kappa_weak_labelers"]).fetchdf()

    # reference votes, replicating each labeler's rule directly
    n_en = []
    for t, nc in zip(texts, nchars):
        ws = [w for w in t.lower().split(" ") if w]
        stops = {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"}
        r1 = 1 if sum(w in stops for w in ws) / len(ws) >= 0.05 else 0
        punct = sum(1 for ch in t if not (ch.isalnum() or ch.isspace()))
        r2 = 1 if punct / len(t) <= 0.08 else 0
        r3 = 1 if nc >= 500 else 0
        n_en.append(r1 + r2 + r3)
    n_en = np.array(n_en)
    p_i = (n_en * (n_en - 1) + (3 - n_en) * (2 - n_en)) / 6.0
    pbar = p_i.mean()
    p_en = n_en.sum() / (3.0 * n)
    pe = p_en**2 + (1 - p_en) ** 2
    kappa = (pbar - pe) / (1 - pe)
    assert abs(out["kappa"][0] - round(kappa, 6)) <= 1e-5


def test_hhh_oracle_invariants():
    """Discounted HHH on a crafted stream: a single spiking hour must be
    reported at level 0 and NOT re-reported at day/root level; discounted
    masses never exceed N and never go negative."""
    import pandas as pd

    rng = _rng(7)
    rows = []
    eid = 0
    base = np.datetime64("2024-03-01T00:00:00", "us")
    hour = np.timedelta64(3600_000_000, "us")
    day = 24 * hour
    # background: 2 events/hour over 10 days
    for d in range(10):
        for h in range(24):
            for _ in range(2):
                rows.append((eid, base + d * day + h * hour, eid % 50, "click", 0.0))
                eid += 1
    # spike: one hour with 100 events
    for _ in range(100):
        rows.append((eid, base + 3 * day + 14 * hour, eid % 50, "click", 0.0))
        eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    con = duckdb.connect()
    con.register("_src", df)
    con.sql("CREATE VIEW events AS SELECT * FROM _src")
    out = con.sql(registry.ORACLES["hierarchical_heavy_hitters"]).fetchdf()
    n = len(df)
    # the spiking hour clears phi=3% (148 >= 0.03*580) and must be level 0
    lvl0 = out[out.level == 0]
    assert any("2024-03-04 h14" == s for s in lvl0.node)
    # discounts are sane
    assert (out.discounted >= 0).all()
    assert out.discounted.sum() <= n
    # the spike day must NOT re-report the spike mass: its discounted
    # count excludes the reported hour
    d3 = out[(out.level == 1) & (out.node == "2024-03-04")]
    if len(d3):
        assert d3.discounted.iloc[0] <= n * 0.03 + 48


def test_cochran_armitage_direct():
    """CA trend z on a crafted table vs the textbook formula."""
    import pandas as pd

    rng = _rng(11)
    rows = []
    eid = 0
    base = np.datetime64("2024-05-01T00:00:00", "us")
    hour = np.timedelta64(3600_000_000, "us")
    ni = rng.integers(50, 150, 24)
    xi = np.minimum(ni, rng.binomial(ni, np.linspace(0.05, 0.4, 24)))
    for h in range(24):
        for j in range(int(ni[h])):
            kind = "purchase" if j < xi[h] else "click"
            rows.append((eid, base + h * hour, eid % 40, kind, 0.0))
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    con = duckdb.connect()
    con.register("_src", df)
    con.sql("CREATE VIEW events AS SELECT * FROM _src")
    out = con.sql(registry.ORACLES["cochran_armitage_trend"]).fetchdf()

    i = np.arange(24, dtype=float)
    N, X = ni.sum(), xi.sum()
    pbar = X / N
    num = (i * xi).sum() - pbar * (i * ni).sum()
    den = pbar * (1 - pbar) * ((i * i * ni).sum() - (i * ni).sum() ** 2 / N)
    z = num / math.sqrt(den)
    assert abs(out["z_trend"][0] - round(z, 6)) <= 1e-4


def test_krippendorff_alpha_closed_form_vs_coincidence_matrix():
    """The query's closed form alpha = 1 - S(3N-1)/(2T(3N-T)) must equal
    the TEXTBOOK procedure: build the coincidence matrix o_ck =
    sum_u n_uc (n_uk - d_ck) / (m_u - 1), then alpha = 1 - Do/De with
    Do = off-diagonal mass / n and De = sum_{c!=k} n_c n_k / (n(n-1))."""
    rng = np.random.default_rng(7)
    n_en = rng.integers(0, 4, size=200)  # 3 raters, binary, complete

    # textbook coincidence-matrix alpha
    o = np.zeros((2, 2))
    for k in n_en:
        counts = np.array([3 - k, k], dtype=float)
        for c in range(2):
            for d in range(2):
                o[c, d] += counts[c] * (counts[d] - (1 if c == d else 0)) / 2.0
    n_c = o.sum(axis=1)
    n = n_c.sum()
    do = (o[0, 1] + o[1, 0]) / n
    de = (n_c[0] * n_c[1] + n_c[1] * n_c[0]) / (n * (n - 1))
    alpha_ref = 1 - do / de

    # the query's closed form
    N = len(n_en)
    S = int((n_en * (3 - n_en)).sum())
    T = int(n_en.sum())
    alpha_cf = 1 - S * (3 * N - 1) / (2 * T * (3 * N - T))
    assert abs(alpha_cf - alpha_ref) < 1e-12


def test_shapley_vocab_efficiency_and_brute_force():
    """The query's 32-coalition lattice Shapley must equal brute-force
    enumeration over all 5! permutations AND satisfy efficiency
    (sum phi_i = v(grand coalition)) on a random mask-count table."""
    import itertools

    rng = np.random.default_rng(11)
    masks = rng.integers(1, 32, size=40)
    counts = rng.integers(1, 100, size=40)

    def v(S):
        return int(sum(c for m, c in zip(masks, counts) if m & S))

    # brute force over permutations
    phi_bf = np.zeros(5)
    for perm in itertools.permutations(range(5)):
        S = 0
        for i in perm:
            phi_bf[i] += v(S | (1 << i)) - v(S)
            S |= 1 << i
    phi_bf /= 120.0

    # the query's lattice form: phi_i*120 = sum over S w(|S|) marginal
    w = {0: 24, 1: 6, 2: 4, 3: 6, 4: 24}
    phi_lat = np.zeros(5)
    for i in range(5):
        for S in range(32):
            if S & (1 << i):
                continue
            k = bin(S).count("1")
            phi_lat[i] += w[k] * (v(S | (1 << i)) - v(S))
    phi_lat /= 120.0

    assert np.allclose(phi_bf, phi_lat)
    assert abs(phi_lat.sum() - v(31)) < 1e-9  # efficiency
