#!/usr/bin/env python3
"""Recover the official JSON-Schema-Test-Suite corpus (public JSON data,
https://github.com/json-schema-org/JSON-Schema-Test-Suite) from the reference
repo's generated ExUnit files (test/json_schema_test_suite/**/*_test.exs —
themselves generated from the upstream JSON by the reference's
mix task, test/support/mix/tasks/gen/test_suite.ex).

This converts TEST DATA, not code: each describe-block's schema literal and
each assert/refute value literal are parsed back into JSON. Output layout
mirrors upstream: tests/json_schema_test_suite/<draft>/<name>.json, each file
a list of {description, schema, tests: [{description, data, valid}]}.

Elixir-term subset parsed: %{"k" => v}, [..], strings (with escapes),
integers (underscore separators / bignums), floats, true/false/nil.
"""

from __future__ import annotations

import json
import os
import re
import sys


class ElixirTermParser:
    def __init__(self, s: str, pos: int = 0):
        self.s = s
        self.i = pos

    def ws(self) -> None:
        while self.i < len(self.s):
            c = self.s[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif c == "#":  # line comment
                while self.i < len(self.s) and self.s[self.i] != "\n":
                    self.i += 1
            else:
                break

    def parse(self):
        self.ws()
        c = self.s[self.i]
        if c == "%":
            assert self.s[self.i:self.i + 2] == "%{", self.ctx()
            self.i += 2
            return self.map_body()
        if c == "{":  # bare tuple shouldn't appear; treat like list
            raise ValueError("unexpected tuple " + self.ctx())
        if c == "<":  # binary literal <<104, 101, ...>> — a string whose
            # inspect form fell back to bytes (e.g. embedded NUL)
            assert self.s[self.i:self.i + 2] == "<<", self.ctx()
            j = self.s.index(">>", self.i)
            byts = bytes(int(x) for x in self.s[self.i + 2:j].split(","))
            self.i = j + 2
            return byts.decode("utf-8")
        if c == "[":
            self.i += 1
            return self.list_body()
        if c == '"':
            return self.string()
        if self.s.startswith("true", self.i):
            self.i += 4
            return True
        if self.s.startswith("false", self.i):
            self.i += 5
            return False
        if self.s.startswith("nil", self.i):
            self.i += 3
            return None
        if c == "-" or c.isdigit():
            return self.number()
        raise ValueError("unexpected char %r %s" % (c, self.ctx()))

    def ctx(self) -> str:
        return "at %d: ...%s..." % (self.i, self.s[max(0, self.i - 40):self.i + 40])

    def map_body(self):
        out = {}
        self.ws()
        if self.s[self.i] == "}":
            self.i += 1
            return out
        while True:
            self.ws()
            key = self.parse()
            self.ws()
            assert self.s[self.i:self.i + 2] == "=>", self.ctx()
            self.i += 2
            val = self.parse()
            out[key] = val
            self.ws()
            if self.s[self.i] == ",":
                self.i += 1
                self.ws()
                if self.s[self.i] == "}":  # trailing comma
                    self.i += 1
                    return out
                continue
            assert self.s[self.i] == "}", self.ctx()
            self.i += 1
            return out

    def list_body(self):
        out = []
        self.ws()
        if self.s[self.i] == "]":
            self.i += 1
            return out
        while True:
            out.append(self.parse())
            self.ws()
            if self.s[self.i] == ",":
                self.i += 1
                self.ws()
                if self.s[self.i] == "]":
                    self.i += 1
                    return out
                continue
            assert self.s[self.i] == "]", self.ctx()
            self.i += 1
            return out

    def string(self) -> str:
        assert self.s[self.i] == '"'
        self.i += 1
        out = []
        while True:
            c = self.s[self.i]
            if c == '"':
                self.i += 1
                return "".join(out)
            if c == "\\":
                self.i += 1
                e = self.s[self.i]
                simple = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"',
                          "0": "\0", "a": "\a", "b": "\b", "e": "\x1b",
                          "f": "\f", "v": "\v", "s": " ", "#": "#", "'": "'"}
                if e in simple:
                    out.append(simple[e])
                    self.i += 1
                elif e == "u":
                    self.i += 1
                    if self.s[self.i] == "{":
                        j = self.s.index("}", self.i)
                        out.append(chr(int(self.s[self.i + 1:j], 16)))
                        self.i = j + 1
                    else:
                        out.append(chr(int(self.s[self.i:self.i + 4], 16)))
                        self.i += 4
                elif e == "x":
                    out.append(chr(int(self.s[self.i + 1:self.i + 3], 16)))
                    self.i += 3
                else:
                    raise ValueError("unknown escape \\%s %s" % (e, self.ctx()))
            else:
                out.append(c)
                self.i += 1

    def number(self):
        m = re.match(r"-?\d[\d_]*(\.[\d_]+)?([eE][+-]?\d+)?", self.s[self.i:])
        assert m, self.ctx()
        txt = m.group(0).replace("_", "")
        self.i += m.end()
        if m.group(1) or m.group(2):
            return float(txt)
        return int(txt)


def parse_schema_arg(src: str, start: int):
    """Parse the first argument of Xema.from_json_schema(...) at `start`
    (just past the open paren). Booleans appear bare: from_json_schema(true, ...)."""
    p = ElixirTermParser(src, start)
    return p.parse(), p.i


def convert_file(path: str) -> list[dict]:
    src = open(path, encoding="utf-8").read()
    groups = []
    describes = [(m.start(), m.group(1))
                 for m in re.finditer(r"describe ~s\|(.*?)\| do", src, re.S)]
    for gi, (dpos, desc) in enumerate(describes):
        end = describes[gi + 1][0] if gi + 1 < len(describes) else len(src)
        block = src[dpos:end]
        m = re.search(r"Xema\.from_json_schema\(", block)
        if not m:
            raise ValueError(f"{path}: no from_json_schema in describe {desc!r}")
        schema, _ = parse_schema_arg(block, m.end())
        tests = []
        for tm in re.finditer(
                r"test ~s\|(.*?)\|, %\{schema: schema\} do\s*"
                r"(assert|refute)\s+valid\?\(\s*schema,\s*", block, re.S):
            p = ElixirTermParser(block, tm.end())
            data = p.parse()
            tests.append({"description": tm.group(1),
                          "data": data,
                          "valid": tm.group(2) == "assert"})
        groups.append({"description": desc, "schema": schema, "tests": tests})
    return groups


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test/json_schema_test_suite"
    out_root = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "json_schema_test_suite")
    n_files = n_groups = n_cases = 0
    for dirpath, _dirs, files in os.walk(ref):
        for fn in sorted(files):
            if not fn.endswith("_test.exs"):
                continue
            src_path = os.path.join(dirpath, fn)
            rel = os.path.relpath(src_path, ref)
            out_rel = rel[:-len("_test.exs")] + ".json"
            out_path = os.path.join(out_root, out_rel)
            try:
                groups = convert_file(src_path)
            except Exception as ex:
                print(f"FAIL {rel}: {ex}")
                continue
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with open(out_path, "w", encoding="utf-8") as f:
                json.dump(groups, f, indent=1, ensure_ascii=False)
            n_files += 1
            n_groups += len(groups)
            n_cases += sum(len(g["tests"]) for g in groups)
    print(f"converted {n_files} files, {n_groups} groups, {n_cases} cases -> {out_root}")


if __name__ == "__main__":
    main()
