"""Extract (writes, queries) from a reference server_test.go test function.

Transcription aid only — reads /root/reference/tests/server_test.go, finds
the named Go test function, evaluates its write timestamps
(mustParseTime(...).UnixNano() forms; now()-relative forms against a PINNED
now), and prints a Python fragment with WRITES / CASES lists in the shape
the tests/test_reference_parity*.py files use.

Usage: python tools/extract_ref_cases.py TestServer_Query_Common [file]
Pinned now: 2030-01-01T01:02:03.456789012Z — tests that use now() must run
handle_query(..., now_ns=PINNED_NOW_NS).
"""

from __future__ import annotations

import datetime
import re
import sys

REF = "/root/reference/tests/server_test.go"

# pinned "now" for now()-relative suites (second-aligned so RFC3339Nano
# round-trips simply; an odd offset would leak into bucket alignment)
PIN = "2030-01-01T01:02:03Z"


def _fn_body(src: str, fn: str) -> tuple[int, str]:
    m = re.search(rf"^func {re.escape(fn)}\(t \*testing\.T\) \{{", src, re.M)
    if not m:
        # shared-registry suites: tests["name"] = Test{ … } in
        # server_suite.go (fall back when no func matches)
        m = re.search(
            rf'tests\["{re.escape(fn)}"\] = Test\{{', src, re.M
        )
    if not m:
        raise SystemExit(f"function {fn} not found")
    start = m.end()
    depth = 1
    i = start
    while depth and i < len(src):
        c = src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    line = src.count("\n", 0, m.start()) + 1
    return line, src[start:i]


def _pad_frac(ts: str) -> str:
    return re.sub(r"\.(\d{6})\d+", r".\1", ts)


def _unix_nano(ts: str) -> int:
    ts2 = ts.replace("Z", "+00:00")
    dt = datetime.datetime.fromisoformat(_pad_frac(ts2))
    frac = re.search(r"\.(\d+)", ts)
    ns = int(dt.timestamp()) * 10**9
    if frac:
        ns += int(frac.group(1).ljust(9, "0"))
    elif dt.microsecond:
        ns += dt.microsecond * 1000
    return ns


def _rfc3339nano(ns: int) -> str:
    sec, frac = divmod(ns, 10**9)
    dt = datetime.datetime.fromtimestamp(sec, tz=datetime.timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if frac:
        f = f"{frac:09d}".rstrip("0")
        return f"{base}.{f}Z"
    return base + "Z"


def _go_dur_ns(expr: str) -> int:
    expr = expr.strip()
    if re.match(r"^-?\d+$", expr):
        return int(expr)  # bare int = nanoseconds (time.Duration literal)
    total = 0
    for m in re.finditer(r"(-?\d+)\s*\*\s*time\.(\w+)", expr):
        n, unit = int(m.group(1)), m.group(2)
        mul = {
            "Nanosecond": 1,
            "Microsecond": 10**3,
            "Millisecond": 10**6,
            "Second": 10**9,
            "Minute": 60 * 10**9,
            "Hour": 3600 * 10**9,
        }[unit]
        total += n * mul
    if total == 0 and ("time." in expr):
        m = re.match(r"time\.(\w+)", expr)
        if m and m.group(1) in (
            "Nanosecond", "Microsecond", "Millisecond", "Second", "Minute",
            "Hour",
        ):
            total = {
                "Nanosecond": 1, "Microsecond": 10**3, "Millisecond": 10**6,
                "Second": 10**9, "Minute": 60 * 10**9, "Hour": 3600 * 10**9,
            }[m.group(1)]
    return total


def _preprocess(body: str) -> str:
    """Replace Go now()/mustParseTime expressions with literals."""
    now_ns = _unix_nano(PIN)

    # local time bindings: `unixNano := mustParseTime(…).UnixNano()` —
    # substitute the computed literal everywhere the name is used
    for bm in re.finditer(
        r'(\w+)\s*:=\s*mustParseTime\(time\.RFC3339Nano?,?\s*"([^"]+)"\)'
        r"\.UnixNano\(\)",
        body,
    ):
        body = re.sub(
            rf"\b{re.escape(bm.group(1))}\b",
            str(_unix_nano(bm.group(2))),
            body,
        )

    def base_expr(expr: str) -> int | None:
        expr = expr.strip()
        if expr == "now":
            return now_ns
        if expr == "yesterday":
            return now_ns - 24 * 3600 * 10**9
        m = re.match(
            r'mustParseTime\(time\.RFC3339Nano?,?\s*"([^"]+)"\)$', expr
        )
        if m:
            return _unix_nano(m.group(1))
        return None

    # X.Add(D).UnixNano() / X.Add(D).Format(time.RFC3339Nano) / bare forms
    pat = re.compile(
        r'(now|yesterday|mustParseTime\(time\.RFC3339Nano?,?\s*"[^"]+"\))'
        r"((?:\.Add\([^()]*(?:\([^()]*\))?[^()]*\))*)"
        r"\.(UnixNano\(\)|Format\(time\.RFC3339(?:Nano)?\)|"
        r"Truncate\(([^)]*)\)\.UnixNano\(\)|Round\(([^)]*)\)\.UnixNano\(\))"
    )

    def repl(m: re.Match) -> str:
        base = base_expr(m.group(1))
        if base is None:
            return m.group(0)
        adds = m.group(2) or ""
        for am in re.finditer(r"\.Add\(([^()]*(?:\([^()]*\))?[^()]*)\)", adds):
            base += _go_dur_ns(am.group(1))
        tail = m.group(3)
        if tail == "UnixNano()":
            return str(base)
        if tail.startswith("Format"):
            return '"' + _rfc3339nano(base) + '"'
        if tail.startswith("Truncate"):
            d = _go_dur_ns(m.group(4))
            return str(base - base % d if d else base)
        if tail.startswith("Round"):
            d = _go_dur_ns(m.group(5))
            if not d:
                return str(base)
            r = base % d
            return str(base - r + (d if r * 2 >= d else 0))
        return m.group(0)

    out = pat.sub(repl, body)
    out = out.replace("strconv.FormatInt(", "str(").replace(", 10)", ")")

    # collapse string concatenations (`a` + "b" + str(1) + `c`) into one
    # backtick literal so command/exp/write regexes see plain literals
    lit = r'(?:`[^`]*`|"(?:[^"\\]|\\.)*"|str\(-?\d+\))'

    def _unlit(s: str) -> str:
        if s.startswith("str("):
            return s[4:-1]
        inner = s[1:-1]
        if s.startswith('"'):
            inner = inner.replace('\\"', '"')
        return inner

    def merge(m: re.Match) -> str:
        parts = re.findall(lit, m.group(0))
        return "`" + "".join(_unlit(p) for p in parts) + "`"

    out = re.sub(rf"{lit}(?:\s*\+\s*{lit})+", merge, out)
    return out


def _sprintf(fmtstr: str, argstr: str, notes: list[str]) -> str | None:
    args: list[str] = []
    depth = 0
    cur = ""
    for c in argstr + ",":
        if c == "," and depth == 0:
            if cur.strip():
                args.append(cur.strip())
            cur = ""
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        cur += c
    out = fmtstr
    for a in args:
        if re.match(r"^-?\d+$", a):
            v = a
        elif re.match(r'^"[^"]*"$', a):
            v = a[1:-1]
        elif re.match(r"^str\(-?\d+\)$", a):
            v = a[4:-1]
        else:
            notes.append(f"unparsed Sprintf arg: {a!r}")
            return None
        m = re.search(r"%(?:d|s|v|f|\.\d+f)", out)
        if not m:
            break
        if m.group(0).endswith("f"):
            v = str(float(v))
        out = out[: m.start()] + v + out[m.end():]
    return out


def _scan_sprintf(body: str):
    """Yield (fmt_raw, argstr) for each fmt.Sprintf(...) with balanced
    parens."""
    for m in re.finditer(r"fmt\.Sprintf\(", body):
        i = m.end()
        depth = 1
        in_bt = in_dq = False
        start = i
        while i < len(body) and depth:
            c = body[i]
            if in_bt:
                if c == "`":
                    in_bt = False
            elif in_dq:
                if c == "\\":
                    i += 1
                elif c == '"':
                    in_dq = False
            elif c == "`":
                in_bt = True
            elif c == '"':
                in_dq = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        inner = body[start: i - 1]
        fm = re.match(r'\s*(`[^`]*`|"(?:[^"\\]|\\.)*")\s*,\s*(.*)$', inner,
                      re.S)
        if fm:
            yield fm.group(1), fm.group(2)
            continue
        # fmt.Sprintf("a\n" + "b\n" + …) — literal concatenation with no
        # args (HintLimit/TagArray/SelectRelativeTime1 write blocks)
        cat = re.match(
            r'\s*("(?:[^"\\]|\\.)*"(?:\s*\+\s*\n?\s*"(?:[^"\\]|\\.)*")+)'
            r"\s*$",
            inner, re.S,
        )
        if cat:
            joined = "".join(
                p[1:-1]
                for p in re.findall(r'"(?:[^"\\]|\\.)*"', cat.group(1))
            )
            yield '"' + joined + '"', ""
            continue
        # bare literal, no args (preprocess may have joined a "+"-chain
        # into one backtick literal that still carries \n escapes)
        bare = re.match(r'\s*(`[^`]*`|"(?:[^"\\]|\\.)*")\s*$', inner, re.S)
        if bare:
            lit = bare.group(1)
            if lit.startswith("`"):
                lit = '"' + lit[1:-1].replace('"', '\\"') + '"'
            yield lit, ""


def _eval_writes(body: str) -> tuple[list[str], list[str]]:
    writes: list[str] = []
    notes: list[str] = []
    for raw_fmt, argstr in _scan_sprintf(body):
        fmtstr = raw_fmt[1:-1]
        if raw_fmt.startswith('"'):
            fmtstr = fmtstr.replace('\\"', '"').replace("\\n", "\n")
        if '"results"' in fmtstr:
            continue  # exp strings handled in _queries
        out = _sprintf(fmtstr, argstr, notes)
        if out is None:
            continue
        for ln in out.split("\n"):
            if ln.strip():
                writes.append(ln.strip())
    # writes := / writes2 := []string{ `...`, "..." } (the writesArray
    # suites append several batches — each becomes part of one stream)
    for m in re.finditer(r"writes\d*\s*:?=\s*\[\]string\{(.*?)\n\t?\}", body,
                         re.S):
        for lm in re.finditer(r'`([^`]+)`|"((?:[^"\\]|\\.)*)"', m.group(1)):
            s = lm.group(1) if lm.group(1) is not None else lm.group(2)
            for ln in s.split("\n"):
                ln = ln.strip()
                if (
                    ln
                    and "%" not in ln
                    and re.match(r"^[A-Za-z_][^ ]*( |,[^ ]+ )[^ ]*=", ln)
                ):
                    writes.append(ln)
    for m in re.finditer(r"&Write\{data:\s*`([^`]+)`", body):
        for ln in m.group(1).strip().splitlines():
            ln = ln.strip()
            if ln:
                writes.append(ln)
    for m in re.finditer(r'&Write\{data:\s*"((?:[^"\\]|\\.)*)"', body):
        for ln in m.group(1).replace("\\n", "\n").split("\n"):
            if ln.strip():
                writes.append(ln.strip())
    # joined literal writes: writes := []string{ "..." , `...` }
    return writes, notes


def _queries(body: str, notes: list[str]) -> list[dict]:
    out = []
    for m in re.finditer(
        r"\{\s*\n\s*name:\s*(?:\"([^\"]*)\"|`([^`]*)`),\s*\n(.*?)\n\s*\}[,)]",
        body,
        re.S,
    ):
        name = m.group(1) if m.group(1) is not None else m.group(2)
        rest = m.group(3)
        q: dict = {"name": name}
        cm = re.search(r"command:\s*`([^`]*)`", rest)
        if cm:
            q["command"] = cm.group(1)
        else:
            cm2 = re.search(r'command:\s*"((?:[^"\\]|\\.)*)"', rest)
            if cm2:
                q["command"] = cm2.group(1).replace('\\"', '"')
        em = re.search(r"exp:\s*`([^`]*)`", rest)
        if em is None:
            em2 = re.search(r'exp:\s*"((?:[^"\\]|\\.)*)"', rest)
            if em2:
                q["exp"] = em2.group(1).replace('\\"', '"')
        else:
            q["exp"] = em.group(1)
        if "exp" not in q:
            sm = re.search(
                r"exp:\s*fmt\.Sprintf\((`[^`]*`|\"(?:[^\"\\]|\\.)*\")\s*,"
                r"\s*(.*?)\),?\s*$",
                rest,
                re.S | re.M,
            )
            if sm:
                raw_fmt = sm.group(1)
                fmtstr = raw_fmt[1:-1]
                if raw_fmt.startswith('"'):
                    fmtstr = fmtstr.replace('\\"', '"')
                v = _sprintf(fmtstr, sm.group(2), notes)
                if v is not None:
                    q["exp"] = v
        q["skip"] = bool(re.search(r"skip:\s*true", rest))
        pm = re.search(r"params:\s*url\.Values\{(.*?)\}", rest, re.S)
        if pm:
            q["params"] = pm.group(1).strip()
        if "command" in q and "exp" in q:
            out.append(q)
        else:
            notes.append(f"dropped case {name!r} (no command/exp parsed)")
    return out


def main() -> None:
    fn = sys.argv[1]
    if len(sys.argv) > 2:
        src = open(sys.argv[2]).read()
    else:
        # shared-registry suites (tests["…"]) live in server_suite.go
        src = open(REF).read()
        if (
            f"func {fn}(" not in src
            and f'tests["{fn}"]' not in src
        ):
            src = open(
                "/root/reference/tests/server_suite.go"
            ).read()
    line, body = _fn_body(src, fn)
    uses_now = bool(re.search(r"\bnow\s*:?=\s*now\(\)", body))
    body = _preprocess(body)
    notes: list[str] = []
    writes, wnotes = _eval_writes(body)
    notes.extend(wnotes)
    cases = _queries(body, notes)
    for n in notes:
        print(f"# NOTE: {n}")
    if uses_now:
        print(f"# USES_NOW: pinned to {PIN} — pass now_ns=PINNED_NOW_NS")
    tag = re.sub(r"[a-z]", "", fn.replace("TestServer_", "")).lower() or "x"
    print(f"# --- {fn} (server_test.go:{line}) ---")
    print(f"{tag.upper()}_WRITES = [")
    for w in writes:
        print(f"    {w!r},")
    print("]")
    print()
    print(f"{tag.upper()}_CASES = [")
    for q in cases:
        pre = "    "
        com = ""
        reason = []
        if q["skip"]:
            reason.append("go-skip")
        if q.get("params"):
            reason.append(f"params: {q['params']!r}")
        if reason:
            com = f"  # {'; '.join(reason)}"
        exp = q["exp"]
        print(f"{pre}(  {com}")
        print(f"{pre}    {q['name']!r},")
        print(f"{pre}    {q['command']!r},")
        print(f"{pre}    {exp!r},")
        print(f"{pre}),")
    print("]")


if __name__ == "__main__":
    main()
