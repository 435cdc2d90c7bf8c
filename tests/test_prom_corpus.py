"""Prometheus compliance corpus runner (reference:
``tests/testdata/aggregators.test``, upstream Prometheus ``load``/``eval``
format, exercised by the reference's ``tests/prom_test.go``).

``load 5m`` blocks define series with arithmetic-sequence notation
(``0+10x10``); ``eval instant at 50m <expr>`` blocks assert the result
vector. Every case our PromQL subset can parse MUST produce exactly the
expected samples; unsupported syntax is counted as skipped (and bounded),
never as silent success.
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from opengemini_spark.promql import MetricRegistry, query_range
from opengemini_spark.promql.engine import Metric

CORPUS = Path("/root/reference/tests/testdata/aggregators.test")

_DUR = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _dur_s(s: str) -> int:
    m = re.fullmatch(r"(\d+)([smhd])", s)
    return int(m.group(1)) * _DUR[m.group(2)]


# a load line is `name[{labels}] tok tok …`; each token is a literal value
# (incl. Inf/NaN), an arithmetic sequence `a+bxN`, or `_` (gap)
_SERIES_RE = re.compile(r"^\s+(\w+)(?:\{([^}]*)\})?[ \t]+(.+?)\s*$")
_NUM = r"[+-]?(?:\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|\.\d+|[Ii]nf)|[Nn]a[Nn]"
_VALGEN_RE = re.compile(
    rf"^({_NUM})(?:([+-](?:\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|\.\d+))x(\d+))?$"
)
# expectations may carry the metric name: `name{labels} v`, `{labels} v`,
# or `name v` (no labels); the name itself isn't part of our label columns
_EXPECT_RE = re.compile(rf"^\s+(?:\w+)?(?:\{{([^}}]*)\}})?[ \t]+({_NUM})\s*$")


def _parse_labels(s: str) -> dict[str, str]:
    out = {}
    for part in filter(None, (p.strip() for p in s.split(","))):
        k, v = part.split("=", 1)
        out[k.strip()] = v.strip().strip('"')
    return out


def parse_corpus(path: Path):
    """→ epochs: [(loads, evals)] — `clear` starts a new storage epoch.
    loads = [(metric, labels, [(t_s, v)])];
    evals = [(at_s, expr, expected {labelset: value} | None-if-unparsed)]."""
    epochs = []
    loads: list[tuple[str, dict, list[tuple[int, float]]]] = []
    evals = []
    lines = path.read_text().splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.strip() == "clear":
            if loads or evals:
                epochs.append((loads, evals))
            loads, evals = [], []
            i += 1
            continue
        if ln.startswith("load "):
            ivl = _dur_s(ln.split()[1])
            i += 1
            while i < len(lines) and _SERIES_RE.match(lines[i]):
                m = _SERIES_RE.match(lines[i])
                name = m.group(1)
                labels = _parse_labels(m.group(2) or "")
                samples, idx, ok = [], 0, True
                for tok in m.group(3).split():
                    if tok == "_":          # gap: advance one interval
                        idx += 1
                        continue
                    g = _VALGEN_RE.match(tok)
                    if not g:
                        ok = False
                        break
                    start = float(g.group(1))
                    step = float(g.group(2) or 0)
                    n = int(g.group(3) or 0)
                    for k in range(n + 1):
                        samples.append(((idx + k) * ivl, start + k * step))
                    idx += n + 1
                if ok and samples:
                    loads.append((name, labels, samples))
                i += 1
            continue
        # eval_ordered asserts order we compare set-wise (values still must
        # match exactly); eval_skip/eval_fail are skipped upstream too
        m = re.match(r"^eval(?:_ordered)? instant at (\S+)\s+(.*)$", ln)
        if m:
            at_s = _dur_s(m.group(1))
            expr = m.group(2)
            expected: dict[frozenset, float] = {}
            ok = True
            i += 1
            while i < len(lines) and lines[i].strip() and not lines[i].startswith(
                ("eval", "load", "#", "clear")
            ):
                em = _EXPECT_RE.match(lines[i])
                if em:
                    expected[frozenset(_parse_labels(em.group(1) or "").items())] = (
                        float(em.group(2))
                    )
                else:
                    ok = False  # expectation syntax we can't parse → skip case
                i += 1
            evals.append((at_s, expr, expected if ok else None))
            continue
        i += 1
    if loads or evals:
        epochs.append((loads, evals))
    return epochs


def _lower_outside_strings(s: str) -> str:
    out, in_q = [], False
    for ch in s:
        if ch == '"':
            in_q = not in_q
        out.append(ch if in_q else ch.lower())
    return "".join(out)


def build_registry(loads):
    """Load blocks → MetricRegistry of in-memory metrics."""
    by_metric: dict[str, list] = {}
    label_keys: dict[str, set] = {}
    for name, labels, samples in loads:
        by_metric.setdefault(name, []).append((labels, samples))
        label_keys.setdefault(name, set()).update(labels)

    reg = MetricRegistry()
    for name, series in by_metric.items():
        keys = sorted(label_keys[name])
        # duplicate (labelset, timestamp) loads: last write wins (upstream
        # promqltest storage semantics — see aggregators.test inf3)
        by_key: dict[tuple, float] = {}
        for labels, samples in series:
            for t_s, v in samples:
                by_key[tuple(labels.get(k) for k in keys) + (t_s * 10**6,)] = (
                    float(v)
                )
        rows = [k + (v,) for k, v in by_key.items()]
        schema = StructType(
            [StructField(k, StringType()) for k in keys]
            + [StructField("tu", LongType()), StructField("value", DoubleType())]
        )

        def loader(spark2, sf_dir2, _rows=rows, _schema=schema):
            return spark2.createDataFrame(_rows, _schema)

        reg.register(name, Metric(loader, labels=keys))
    return reg


def test_corpus_loads_parse():
    epochs = parse_corpus(CORPUS)
    assert len(epochs) >= 2
    loads, evals = epochs[0]
    assert len(loads) >= 10
    assert len(evals) >= 30
    # spot-check the sequence notation
    name, labels, samples = loads[0]
    assert name == "http_requests" and samples[0] == (0, 0.0)
    assert samples[10] == (3000, 100.0)


def test_corpus_eval_instant(spark, sf_dir):
    n_pass = n_skip = 0
    failures = []
    for loads, evals in parse_corpus(CORPUS):
        corpus_registry = build_registry(loads)
        _run_epoch(spark, sf_dir, corpus_registry, evals, failures,
                   counters := [0, 0])
        n_pass += counters[0]
        n_skip += counters[1]
    assert not failures, f"{len(failures)} corpus mismatches; first: {failures[0]}"
    # r2: the full corpus evaluates (80 pass / 0 skip) — NaN/Inf literals
    # and constant scalar() arithmetic all supported; keep the floor tight
    # so a regression in any of them fails loudly
    assert n_pass >= 80, f"only {n_pass} corpus cases passed ({n_skip} skipped)"
    assert n_skip == 0, f"{n_skip} corpus cases skipped"


def _sample_eq(got: float, exp: float) -> bool:
    """Prometheus test equality: NaN matches NaN, ±Inf exactly, else 1e-6
    relative tolerance."""
    if got is None:
        return False
    if math.isnan(exp):
        return math.isnan(got)
    if math.isinf(exp) or math.isinf(got):
        return got == exp
    return abs(got - exp) <= 1e-6 * max(1.0, abs(exp))


def _run_epoch(spark, sf_dir, corpus_registry, evals, failures, counters):
    for at_s, expr, expected in evals:
        if expected is None:
            counters[1] += 1
            continue
        q = _lower_outside_strings(expr)
        try:
            # step > 0 required; at 0s the 1s step keeps the grid at {0}
            df = query_range(spark, sf_dir, corpus_registry, q,
                             at_s, at_s, max(at_s, 1))
            rows = df.collect()
        except (SyntaxError, ValueError, KeyError, AssertionError, NotImplementedError):
            counters[1] += 1
            continue
        got = {}
        label_cols = [c for c in df.columns if c not in ("t", "value")]
        for r in rows:
            key = frozenset(
                (c, r[c]) for c in label_cols if r[c] is not None
            )
            got[key] = r["value"]
        if set(got) != set(expected) or any(
            not _sample_eq(got[k], expected[k]) for k in expected
        ):
            failures.append((expr, expected, got))
        else:
            counters[0] += 1
