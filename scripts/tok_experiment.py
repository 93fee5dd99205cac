"""Tokenizer-floor experiment (round-4; ROADMAP item 3, verdict item 7).

The signature UDF's Python floor is ``_TOKEN_RE.findall`` (~200 us/doc) plus
the per-token blake2b cache loop (~180 us/doc).  This script prototypes a
fully vectorized replacement — numpy code-point classification for token
boundaries + a segmented polynomial rolling hash (invertible-multiplier
prefix trick) for per-token 64-bit hashes — and measures both paths on the
bench corpus generator's content.

Boundary semantics must be EXACTLY the regex's:
    [a-z_][a-z0-9_]*  |  [0-9]+  |  [^\\sa-z0-9_]
i.e. identifier runs (letters absorb trailing digits), digit runs NOT
preceded by a letter, and every other non-space char as a 1-char token.
The prototype checks equivalence on generated + adversarial inputs before
timing.  Hash values differ from blake2b by design (vectorized poly+mix vs
per-token digest) — both are deterministic content-derived 64-bit families,
so MinHash/SimHash statistics are unaffected; bit-compatibility with
existing checkpoints is NOT preserved, which is why the production flag
(DedupConfig.tokenizer) defaults to the blake2b path.

Usage: python scripts/tok_experiment.py [n_docs]
"""

from __future__ import annotations

import re
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from cloud_dedup_spark.corpus import _Gen  # noqa: E402
from cloud_dedup_spark.operators.signatures import (  # noqa: E402
    _TOKEN_RE,
    _token_hash_array,
)

# ---------------------------------------------------------------- classifier

_TABLE_N = 0x3001  # covers every codepoint Python's re \s matches (max 0x3000)
_CLS = np.full(_TABLE_N, 3, dtype=np.uint8)  # 3 = other
_ws_re = re.compile(r"\s")
for _i in range(_TABLE_N):
    if _ws_re.match(chr(_i)):
        _CLS[_i] = 0  # space
for _i in range(ord("a"), ord("z") + 1):
    _CLS[_i] = 1  # alpha
_CLS[ord("_")] = 1
for _i in range(ord("0"), ord("9") + 1):
    _CLS[_i] = 2  # digit

_M = np.uint64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2^64
_MINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


_POW_CACHE: list = [np.ones(1, np.uint64), np.ones(1, np.uint64)]


def _pows(n: int):
    """Position-only M^i / M^-i arrays, grown on demand and reused."""
    cached = _POW_CACHE[0]
    if len(cached) < n:
        size = max(n, 2 * len(cached))
        minv_pow = np.empty(size, dtype=np.uint64)
        minv_pow[0] = 1
        np.cumprod(np.full(size - 1, _MINV, dtype=np.uint64), out=minv_pow[1:])
        m_pow = np.empty(size, dtype=np.uint64)
        m_pow[0] = 1
        np.cumprod(np.full(size - 1, _M, dtype=np.uint64), out=m_pow[1:])
        _POW_CACHE[0], _POW_CACHE[1] = minv_pow, m_pow
    return _POW_CACHE[0], _POW_CACHE[1]


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# --------------------------------------------- translate+split prototype
# Maps every ASCII 'other' char c -> " c " so whitespace split yields tokens;
# digit-led alnum chunks ("23ab") still need one split at the first alpha,
# which a cheap C regex probe detects (rare in real code).
_TRANS = {}
for _i in range(128):
    if _CLS[_i] == 3:
        _TRANS[_i] = f" {chr(_i)} "
_DIGIT_LED = re.compile(r"(?<![a-z0-9_])[0-9]+[a-z_]")
_CHUNK_SPLIT = re.compile(r"[0-9]+|[a-z_][a-z0-9_]*")


def tokenize_translate(t: str):
    """Bit-identical token list via translate+split; falls back to findall."""
    if not t.isascii():
        return _TOKEN_RE.findall(t)
    toks = t.translate(_TRANS).split()
    if _DIGIT_LED.search(t) is None:
        return toks
    out = []
    for tok in toks:
        if tok[0].isdigit() and not tok.isdigit():
            out.extend(_CHUNK_SPLIT.findall(tok))
        else:
            out.append(tok)
    return out


def scan_batch(texts: list[str]):
    """Vectorized tokenize+hash for a batch of docs.

    Returns (hashes: uint64[n_tokens], doc_tok_offsets: int64[n_docs+1],
             starts, ends, cp) — starts/ends/cp only needed for equivalence
    checking (token text reconstruction).
    """
    if not texts:
        z = np.zeros(1, dtype=np.int64)
        return np.empty(0, np.uint64), z, None, None, None
    buf = " ".join(texts)  # space separator: whitespace class, never a token
    cp = np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32)
    n = len(cp)
    idx = np.minimum(cp, _TABLE_N - 1)
    cls = _CLS[idx]
    cls[cp > _TABLE_N - 1] = 3  # codepoints beyond the table are 'other'
    alpha = cls == 1
    digit = cls == 2
    other = cls == 3
    w = alpha | digit
    ar = np.arange(n, dtype=np.int32)  # int32 positions: half the traffic
    run_start = w.copy()
    run_start[1:] &= ~w[:-1]
    # start2: first alpha of a digit-led [a-z0-9_] run ("23ab" -> "23","ab")
    last_alpha = np.maximum.accumulate(np.where(alpha, ar, np.int32(-1)))
    rs = np.maximum.accumulate(np.where(run_start, ar, np.int32(-1)))
    start2 = np.zeros(n, dtype=bool)
    start2[1:] = alpha[1:] & digit[:-1]
    start2[1:] &= last_alpha[:-1] < rs[1:]
    starts_mask = run_start | start2 | other
    # token end = next position that is a stop (non-continuation or new start)
    stop = (~w) | starts_mask
    nxt = np.where(stop, ar, np.int32(n))
    next_stop = np.minimum.accumulate(nxt[::-1])[::-1]
    starts = np.nonzero(starts_mask)[0]
    ends = np.where(
        starts + 1 < n, next_stop[np.minimum(starts + 1, n - 1)], n
    ).astype(np.int64)
    # ---------------- segmented polynomial hash over [start, end) ----------
    x = cp.astype(np.uint64) | np.uint64(1) << np.uint64(32)  # nonzero terms
    minv_pow, m_pow = _pows(n)
    minv_pow, m_pow = minv_pow[:n], m_pow[:n]
    q = np.cumsum(x * minv_pow)  # uint64 wraparound == mod 2^64
    q_end = q[ends - 1]
    q_pre = np.where(starts > 0, q[np.maximum(starts - 1, 0)], np.uint64(0))
    raw = (q_end - q_pre) * m_pow[ends - 1]
    hashes = _splitmix64(raw)
    # ---------------- per-doc token offsets --------------------------------
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    doc_char_starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=doc_char_starts[1:])  # +1 for the space separator
    doc_tok = np.searchsorted(starts, doc_char_starts)
    return hashes, doc_tok, starts, ends, cp


# ---------------------------------------------------------------- harness


def token_strings(texts, starts, ends, cp):
    buf = " ".join(texts)
    return [buf[s:e] for s, e in zip(starts.tolist(), ends.tolist())]


ADVERSARIAL = [
    "",
    "   ",
    "abc",
    "123",
    "23ab4cd",
    "ab2cd ef",
    "2cd",
    "_x9 9_x",
    "a+b==c",
    "xéy",          # non-ascii letter -> 1-char 'other' token
    "tab\tnew\nline",
    "　wide　",  # ideographic space is \s
    "中文 code", # CJK chars: each its own token
    "9" * 300,
    "_" + "a1" * 100,
    "!!##$$",
    "a\x00b",  # NUL is not \s: must come through as a 1-char 'other' token
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    gen = _Gen(1234)
    texts = [gen.body(30).lower() for _ in range(n_docs)]

    # -- equivalence (generated + adversarial) --
    for group in (texts[:200], ADVERSARIAL):
        h, dt, st, en, cp = scan_batch(group)
        got = token_strings(group, st, en, cp)
        want = [tok for t in group for tok in _TOKEN_RE.findall(t)]
        assert got == want, (
            f"boundary mismatch: got {got[:20]} want {want[:20]}"
        )
        # per-doc split equivalence
        for i, t in enumerate(group):
            lo, hi = dt[i], dt[i + 1]
            assert got[lo:hi] == _TOKEN_RE.findall(t), (i, t)
    print(f"boundary equivalence OK on {len(texts[:200])} generated "
          f"+ {len(ADVERSARIAL)} adversarial docs")

    # -- hash sanity: same token text -> same hash, distinct mostly distinct
    h, dt, st, en, cp = scan_batch(texts[:200])
    toks = token_strings(texts[:200], st, en, cp)
    by_tok: dict[str, int] = {}
    collisions = 0
    for tok, hv in zip(toks, h.tolist()):
        if tok in by_tok:
            assert by_tok[tok] == hv, f"same token, different hash: {tok}"
        else:
            if hv in set(by_tok.values()):
                collisions += 1
            by_tok[tok] = hv
    print(f"hash consistency OK ({len(by_tok)} distinct tokens, "
          f"{collisions} 64-bit collisions)")

    # -- translate+split equivalence (incl. adversarial) ------------------
    for t in texts[:200] + ADVERSARIAL:
        assert tokenize_translate(t) == _TOKEN_RE.findall(t), repr(t[:60])
    print("translate+split equivalence OK")

    # -- timing -----------------------------------------------------------
    reps = 3
    n_tok = sum(len(_TOKEN_RE.findall(t)) for t in texts)
    print(f"docs={n_docs} mean_tokens/doc={n_tok / n_docs:.0f}")

    def best_of(fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def run_current():
        cache: dict[str, int] = {}
        for t in texts:
            _token_hash_array(_TOKEN_RE.findall(t), cache)

    def run_translate():
        cache: dict[str, int] = {}
        for t in texts:
            _token_hash_array(tokenize_translate(t), cache)

    scan_batch(texts[:10])  # warm the pow cache outside timing
    for label, fn in (
        ("current   (findall + cached blake2b)", run_current),
        ("translate (split  + cached blake2b)", run_translate),
        ("vectorized (numpy scan + poly hash)", lambda: scan_batch(texts)),
    ):
        sec = best_of(fn)
        print(f"{label}: {sec:.3f}s ({1e6 * sec / n_docs:.0f} us/doc)")


if __name__ == "__main__":
    main()
