"""Extract (writes, cases) from a reference prom_test.go test function.

Transcription aid only — reads /root/reference/tests/prom_test.go, finds
the named Go test, evaluates its write lines (literal-int timestamps) and
prints a Python fragment: WRITES list plus CASES of
(name, command, params_dict, path, exp).

Usage: python tools/extract_prom_cases.py TestServer_PromQuery_Basic [file]
"""

from __future__ import annotations

import re
import sys

REF = "/root/reference/tests/prom_test.go"


def _fn_body(src: str, fn: str) -> str:
    m = re.search(rf"^func {re.escape(fn)}\(t \*testing\.T\) \{{", src, re.M)
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
    return src[start:i]


def _eval_write(expr: str) -> str | None:
    # fmt.Sprintf(`line %d`, 1709258312955000000) or a plain backtick line
    m = re.match(
        r"fmt\.Sprintf\(`([^`]*)`\s*,\s*(\d+)\)", expr.strip()
    )
    if m:
        return m.group(1).replace("%d", m.group(2))
    m = re.match(r"`([^`]*)`$", expr.strip())
    if m and "%" not in m.group(1):
        return m.group(1)
    m = re.match(r'"([^"]*)"$', expr.strip())
    if m and "%" not in m.group(1):
        return m.group(1)
    return None


def _gen_writes(body: str) -> list[str]:
    """Transpile the Go write-generator fragment (loops of
    ``writes = append(writes, fmt.Sprintf(...))``) to Python and run it.
    Covers the fixture-builder idioms prom_test.go uses — integer
    assignments, []string slices, counted for-loops, int64 casts,
    time.Second."""
    sec = body
    for stop in ("\ttest :=", "\ttest.writes", "\tfor _, query"):
        k = sec.find(stop)
        if k != -1:
            sec = sec[:k]
    py: list[str] = ["writes = []"]
    indent = 0
    for raw in sec.splitlines():
        ln = raw.split("//")[0].strip()
        if not ln:
            continue
        ln = ln.replace(":=", "=")
        if ln == "}":
            indent = max(0, indent - 1)
            continue
        m = re.match(r"for (\w+) = (\w+); \1 (<=|<) ([\w()+*.\[\]]+); "
                     r"\1(?:\+\+|\s*\+=\s*(\w+)) \{", ln)
        if m:
            var, lo, op, hi, step = m.groups()
            hi = _goexpr(hi)
            step = step or "1"
            py.append("    " * indent
                      + f"for {var} in range({lo}, {hi}"
                      + (" + 1" if op == "<=" else "") + f", {step}):")
            indent += 1
            continue
        m = re.match(r"writes = append\(writes, fmt\.Sprintf\("
                     r"`([^`]*)`\s*,\s*(.*)\)\)$", ln)
        if m:
            tpl, args = m.groups()
            py.append("    " * indent
                      + f"writes.append({tpl!r} % ({_goexpr(args)},))")
            continue
        m = re.match(r"writes = append\(writes, (\w+)\)$", ln)
        if m:
            py.append("    " * indent + f"writes.append({m.group(1)})")
            continue
        m = re.match(r"(\w+) = fmt\.Sprintf\(`([^`]*)`\s*,\s*(.*)\)$", ln)
        if m:
            var, tpl, args = m.groups()
            py.append("    " * indent
                      + f"{var} = {tpl!r} % ({_goexpr(args)},)")
            continue
        m = re.match(r"(\w+) = \[\](?:string|float64|int64|int)\{(.*)\}$",
                     ln)
        if m:
            py.append("    " * indent + f"{m.group(1)} = [{m.group(2)}]")
            continue
        m = re.match(r"(\w+) = make\(", ln)
        if m:
            py.append("    " * indent + f"{m.group(1)} = []")
            continue
        m = re.match(r"(\w+) (\+=|-=|=) ([\w ()+\-*/.\[\]]+)$", ln)
        if m and not ln.startswith(("if ", "s ", "defer", "t.")):
            py.append("    " * indent
                      + f"{m.group(1)} {m.group(2)} {_goexpr(m.group(3))}")
            continue
        # anything else in the preamble (server setup) is ignorable
    ns: dict = {}
    exec("\n".join(py), {}, ns)
    return ns.get("writes", [])


def _goexpr(e: str) -> str:
    e = re.sub(r"int64\(([^)]*)\)", r"(\1)", e)
    e = e.replace("time.Second", "(10**9)")
    return e


def _parse_params(block: str) -> dict:
    out = {}
    for m in re.finditer(
        r'"([\w\[\]-]+)":\s*\[\]string\{"((?:[^"\\]|\\.)*)"\}', block
    ):
        out[m.group(1)] = m.group(2).replace('\\"', '"')
    return out


def main() -> None:
    fn = sys.argv[1]
    ref = sys.argv[2] if len(sys.argv) > 2 else REF
    src = open(ref).read()
    body = _fn_body(src, fn)

    writes: list[str] = []
    wm = re.search(r"writes\s*:?=\s*\[\]string\{(.*?)\n\t\}", body, re.S)
    if "writes = append(writes" in body:
        writes = _gen_writes(body)
    elif wm:
        for raw in re.findall(r"(?:fmt\.Sprintf\([^)]*\)|`[^`]*`|\"[^\"]*\")",
                              wm.group(1)):
            w = _eval_write(raw)
            if w is not None:
                writes.append(w)
            else:
                print(f"# WARNING: write not evaluated: {raw[:90]}")

    cases = []
    for qm in re.finditer(r"&?Query\{(.*?)\n\t\t\}", body, re.S):
        q = qm.group(1)
        name = re.search(r'name:\s+`([^`]*)`|name:\s+"([^"]*)"', q)
        cmd = re.search(r"command:\s+`([^`]*)`", q)
        exp = re.search(r"exp:\s+`([^`]*)`", q)
        path = re.search(r'path:\s+"([^"]*)"', q)
        skip = re.search(r"skip:\s+true", q)
        if not (cmd and exp):
            nm = name.group(1) or name.group(2) if name else "?"
            print(f"# NOTE: dropped case {nm!r} (no command/exp parsed)")
            continue
        if skip:
            nm = name.group(1) or name.group(2) if name else "?"
            print(f"# NOTE: Go-skipped case {nm!r} omitted")
            continue
        params = _parse_params(q)
        cases.append((
            (name.group(1) or name.group(2)) if name else cmd.group(1)[:40],
            cmd.group(1),
            params,
            path.group(1) if path else "/api/v1/query",
            exp.group(1),
        ))

    tag = "".join(w[0] for w in fn.replace("TestServer_", "").split("_"))
    print(f"# --- {fn} (prom_test.go) ---")
    print(f"{tag}_WRITES = [")
    for w in writes:
        print(f"    {w!r},")
    print("]")
    print()
    print(f"{tag}_CASES = [")
    for name, cmd, params, path, exp in cases:
        print("    (")
        print(f"        {name!r},")
        print(f"        {cmd!r},")
        print(f"        {params!r},")
        print(f"        {path!r},")
        print(f"        {exp!r},")
        print("    ),")
    print("]")


if __name__ == "__main__":
    main()
