"""Default token-expansion dictionary for source code.

The code analog of the reference's shipped per-language address dictionaries
(``resources/dictionaries/<lang>/*.txt``, matched multi-token-phrase-first by
``search_address_dictionaries_tokens`` via a trie,
/root/reference/src/address_dictionary.c:286-311, /root/reference/src/trie_search.c:240).
Where libpostal folds "St" ≡ "Street" and "Ave" ≡ "Avenue", a source-code
canonicalizer folds the abbreviation conventions programmers actually vary
on: ``cfg`` ≡ ``config`` ≡ ``configuration``, ``init`` ≡ ``initialize``,
camel-split compounds like ``call back`` ≡ ``callback``.

Keys may be multi-token phrases (space-separated) — matched greedily,
longest-first, exactly like the reference's phrase search. The dictionary is
deliberately cascade-free: no replacement output re-matches another key, so
one left-to-right pass is a fixpoint (and the sequential string-replace SQL
twin in __spark_entry__ is exactly equivalent).

Keywords of common languages (def, int, for, if…) are deliberately absent —
expanding those would fold genuinely different code. Like every libpostal
dictionary, this list is curative, not exhaustive: pass your own pairs via
``PipelineConfig.token_expansions``.
"""

from __future__ import annotations

# single-token abbreviations → canonical full form
SINGLE_TOKEN_EXPANSIONS: tuple[tuple[str, str], ...] = (
    ("addr", "address"),
    ("arg", "argument"),
    ("args", "arguments"),
    ("attr", "attribute"),
    ("attrs", "attributes"),
    ("auth", "authentication"),
    ("buf", "buffer"),
    ("cb", "callback"),
    ("cfg", "configuration"),
    ("cmd", "command"),
    ("conf", "configuration"),
    ("config", "configuration"),
    ("conn", "connection"),
    ("ctx", "context"),
    ("db", "database"),
    ("dest", "destination"),
    ("dir", "directory"),
    ("doc", "document"),
    ("docs", "documents"),
    ("env", "environment"),
    ("err", "error"),
    ("fn", "function"),
    ("func", "function"),
    ("idx", "index"),
    ("impl", "implementation"),
    ("init", "initialize"),
    ("len", "length"),
    ("lib", "library"),
    ("msg", "message"),
    ("num", "number"),
    ("obj", "object"),
    ("param", "parameter"),
    ("params", "parameters"),
    ("pkg", "package"),
    ("prev", "previous"),
    ("proc", "process"),
    ("prop", "property"),
    ("props", "properties"),
    ("ptr", "pointer"),
    ("req", "request"),
    ("res", "response"),
    ("resp", "response"),
    ("src", "source"),
    ("stmt", "statement"),
    ("str", "string"),
    ("tmp", "temporary"),
    ("util", "utility"),
    ("utils", "utility"),
    ("val", "value"),
    ("var", "variable"),
)

# multi-token phrases (as produced by the camel/underscore splitter) folded
# to one compound token — "callBack"/"call_back"/"callback" all canonicalize
# to "callback"
PHRASE_EXPANSIONS: tuple[tuple[str, str], ...] = (
    ("call back", "callback"),
    ("data base", "database"),
    ("data set", "dataset"),
    ("end point", "endpoint"),
    ("file name", "filename"),
    ("no op", "noop"),
    ("set up", "setup"),
    ("time out", "timeout"),
    ("time stamp", "timestamp"),
    ("white list", "allowlist"),
    ("allow list", "allowlist"),
)

DEFAULT_CODE_EXPANSIONS: tuple[tuple[str, str], ...] = (
    PHRASE_EXPANSIONS + SINGLE_TOKEN_EXPANSIONS
)
