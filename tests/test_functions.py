"""Unit tests for the pure kernels (no Ray) against simple oracles."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from refined_ray.functions.hashing import hash_str_array, md5_hex, splitmix64, stable_hash64_str
from refined_ray.functions.minhash import (
    NUM_PERMS,
    band_keys,
    minhash_signatures,
    shingle_hashes,
)
from refined_ray.functions.normalize import NORMALIZE_SQL, normalize_surface_array, normalize_surface_form
from refined_ray.functions.simhash import hamming_distance, simhash_batch
from refined_ray.functions.strings import (
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein_batch,
    levenshtein_similarity_batch,
)
from refined_ray.functions.tokenize import tokenize, tokenize_batch


# ---------- hashing ----------

def test_stable_hash_is_process_independent():
    # frozen expected values: changing the hash fn breaks partitioning
    assert stable_hash64_str("hello") == stable_hash64_str("hello")
    assert stable_hash64_str("hello") != stable_hash64_str("hello2")


def test_splitmix64_bijective_sample():
    x = np.arange(10_000, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == len(x)


def test_hash_str_array_matches_itself_and_discriminates():
    a = hash_str_array(["a", "b", "a", ""])
    assert a[0] == a[2]
    assert a[0] != a[1]


def test_md5_matches_duckdb():
    duckdb = pytest.importorskip("duckdb")
    strs = ["", "hello", "héllo wörld", "a b c"]
    ours = md5_hex(strs)
    theirs = [duckdb.sql(f"select md5(?)", params=[s]).fetchone()[0] for s in strs]
    assert ours == theirs


# ---------- normalization: engine == DuckDB oracle ----------

def test_normalize_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")
    cases = [
        "The Quick. Brown's Fox",
        "  padded  ",
        'He said "hi" `there`',
        "Crème brûlée",
        "the the the",
        "THE END.",
        "",
        "no-change",
    ]
    ours = normalize_surface_array(pa.array(cases)).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(cases)}))
    sql = NORMALIZE_SQL.format(col="s")
    theirs = [r[0] for r in con.execute(f"select {sql} from t").fetchall()]
    assert ours == theirs


def test_normalize_scalar_examples():
    assert normalize_surface_form("The Beatles") == "beatles"
    assert normalize_surface_form("U.S.A.") == "usa"
    assert normalize_surface_form("Bob's") == "bob"


# ---------- tokenize ----------

def test_tokenize_batch_flat_layout():
    texts = ["Hello, world!", "", "a b  c"]
    flat, starts = tokenize_batch(texts)
    assert flat == ["hello", "world", "a", "b", "c"]
    assert starts.tolist() == [0, 2, 2, 5]
    assert tokenize("Hello, world!") == ["hello", "world"]


# ---------- minhash ----------

def test_minhash_identical_texts_identical_sigs():
    texts = ["the quick brown fox jumps over the lazy dog"] * 2
    flat, starts = tokenize_batch(texts)
    sh, shs = shingle_hashes(flat, starts)
    sig = minhash_signatures(sh, shs)
    assert np.array_equal(sig[0], sig[1])
    bk = band_keys(sig)
    assert np.array_equal(bk[0], bk[1])


def test_minhash_estimates_jaccard():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    base = [rng.choice(vocab) for _ in range(300)]
    # drop 10% of tokens -> high jaccard variant
    variant = [t for t in base if rng.random() > 0.1]
    other = [rng.choice(vocab) for _ in range(300)]
    texts = [" ".join(base), " ".join(variant), " ".join(other)]
    flat, starts = tokenize_batch(texts)
    sh, shs = shingle_hashes(flat, starts)

    def exact_j(i, j):
        si = set(sh[shs[i]:shs[i + 1]].tolist())
        sj = set(sh[shs[j]:shs[j + 1]].tolist())
        return len(si & sj) / len(si | sj)

    sig = minhash_signatures(sh, shs)
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    assert abs(est_near - exact_j(0, 1)) < 0.15
    assert est_far < exact_j(0, 2) + 0.15
    assert est_near > 0.5
    assert est_far < 0.2


def test_minhash_short_and_empty_docs():
    texts = ["one two", "one two", "", "solo"]
    flat, starts = tokenize_batch(texts)
    sh, shs = shingle_hashes(flat, starts)
    assert (shs[1:] - shs[:-1] >= 1).all()
    sig = minhash_signatures(sh, shs)
    assert np.array_equal(sig[0], sig[1])
    assert sig.shape == (4, NUM_PERMS)


# ---------- levenshtein ----------

def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_vs_reference_random():
    rng = random.Random(42)
    alpha = "abcde"
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
        )
        for _ in range(200)
    ]
    a, b = zip(*pairs)
    got = levenshtein_batch(list(a), list(b))
    want = [_lev_ref(x, y) for x, y in pairs]
    assert got.tolist() == want


def test_levenshtein_similarity_bounds():
    sims = levenshtein_similarity_batch(["abc", "", "same"], ["abd", "", "same"])
    assert sims[1] == 1.0 and sims[2] == 1.0
    assert 0 < sims[0] < 1


# ---------- jaro-winkler ----------

def test_jaro_winkler_known_values():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.8400, abs=1e-4)
    assert jaro_winkler("x", "x") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    got = jaro_winkler_batch(["MARTHA"], ["MARHTA"])
    assert got[0] == pytest.approx(0.9611, abs=1e-4)


# ---------- simhash ----------

def test_simhash_similar_texts_close():
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different words entirely unrelated content here now " * 5
    fps = simhash_batch([base, near, far, base])
    assert fps[0] == fps[3]
    d_near = hamming_distance(fps[:1], fps[1:2])[0]
    d_far = hamming_distance(fps[:1], fps[2:3])[0]
    assert d_near < d_far
    assert d_near <= 16


def test_inject_entity_pairs_normalize_collapse():
    """AdditionalEntity injection (§2.10): label and a 'The <NAME>'
    alias must collapse onto one normalized surface, yielding one
    count-pair row per surface form (generate_pem.py:77-79)."""
    from refined_ray.pipelines.queries import inject_entity_pairs

    t = inject_entity_pairs([
        {"entity_id": "A7", "label": "BRAZIL", "aliases": ["The BRAZIL"]},
        {"entity_id": "A8", "label": "St. Lucia's Isle", "aliases": []},
    ])
    rows = list(zip(t["surface"].to_pylist(), t["entity"].to_pylist()))
    # "'s" strips as a unit (before the bare-apostrophe pass — the
    # M1 contract's replacement order)
    assert rows == [("brazil", "A7"), ("brazil", "A7"),
                    ("st lucia isle", "A8")]
