"""Format conformance, mirroring /root/reference/lib/xema/format.ex doctests
and test/json_schema_test_suite/draft7/optional/format/*."""

from __future__ import annotations

from tests.helpers import check_cases

CASES = {
    "date": [("2024-02-29", True), ("2024-02-30", False), ("2024-13-01", False),
             ("1963-06-19", True), ("06/19/1963", False), ("x", False)],
    "date-time": [
        ("1963-06-19T08:30:06.283185Z", True),
        ("1963-06-19t08:30:06z", True),          # case-insensitive T/Z
        ("1963-06-19T08:30:06+02:00", True),
        ("06/19/1963 08:30:06 PST", False),
        ("1963-06-19T08:30:06", False),          # offset required
        ("2013-350T01:01:01", False),
    ],
    "time": [("08:30:06Z", True), ("08:30:06+02:00", True), ("25:30:06Z", False),
             ("08:30:06", False)],
    "email": [("foo@bar.net", True), ("Otto.Normal@Verbraucher.NET", True),
              ("foo.bar.net", False), ("Otto.Normalverbraucher", False),
              (".leading@dot.net", False), ("double..dot@x.net", False)],
    "hostname": [("elixirforum.com", True), ("localhost", True),
                 ("go go go", False), ("endswithdash-", False),
                 # NB: "x-.com" is VALID per the reference: the trailing-dash
                 # guard applies to the whole string only (format.ex:225-226)
                 ("x-.com", True),
                 ("a" * 64 + ".com", False)],
    "host": [("127.0.0.1", True), ("localhost", True), ("::1", True),
             ("go go go", False)],
    "ipv4": [("127.0.0.1", True), ("256.0.0.1", False), ("1.2.3", False),
             ("0.0.0.0", True)],
    "ipv6": [("::1", True), ("2001:db8::8a2e:370:7334", True),
             ("1:2:3:4:5:6:7:8", True), ("12345::", False), ("1::2::3", False),
             ("127.0.0.1", False)],
    "json-pointer": [("/foo/bar", True), ("", True), ("/foo/~01", True),
                     ("/foo/~2", False), ("foo", False)],
    "relative-json-pointer": [("1", True), ("0#", True), ("1/foo", True),
                              ("10", False), ("#/foo", False)],
    "uri": [("http://example.com/path?q=1#f", True),
            ("mailto:user@example.com", True),
            ("//no-scheme.com/x", False),
            ("http://ends-with-dash-/x", False)],
    "uri-reference": [("//example.com/x", True), ("/relative/path", True),
                      ("http://x.y/z", True)],
    "uri-template": [("http://example.com/{id}", True),
                     ("http://example.com/{+path}/here", True)],
    "regex": [("^a+$", True), ("[", False), ("(a|b)*", True)],
    "unknown-format": [("anything", True)],
    "idn-email": [("anything", True)],  # unsupported -> pass (docs/unsupported.md:8-12)
}


def test_formats(spark):
    for fmt, cases in CASES.items():
        check_cases(spark, {"type": "string", "format": fmt}, cases)
