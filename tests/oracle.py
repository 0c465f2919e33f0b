"""Pure-Python oracle re-implementing the engine's lookup semantics
(which themselves mirror unimib-datAI/lamAPI
api/model/data_retrievers/lookup_retriever.py:118-182 + elastic.py:46-64,
with the deterministic token-overlap score documented in
lamapi_spark/operators/lookup.py). Used to verify the Spark dataflow
field-by-field on small fixtures."""

from __future__ import annotations


def clean_str(s: str) -> str:
    return " ".join(s.lower().split())


def lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def ngrams(text: str, n):
    out = set()
    for token in text.split(" "):
        if n is None:
            out.add(token)
        else:
            out.update(token[i:i + n] for i in range(len(token) - n + 1))
    return out


def sim(a: str, b: str, n) -> float:
    ga, gb = ngrams(a, n), ngrams(b, n)
    return round(len(ga & gb) / max(len(ga), len(gb), 1), 2)


def ed_score(a: str, b: str) -> float:
    return round(1 - lev(a, b) / max(len(a), len(b), 1), 2)


def edit_band(token: str) -> int:
    if len(token) >= 6:
        return 2
    if len(token) >= 3:
        return 1
    return 0


def lookup_oracle(
    mention: str,
    dict_rows: list[dict],
    type_names: dict[str, str],
    limit: int = 1000,
    fuzzy: bool = False,
    kind=None, ner_type=None, language=None, types=None,
) -> list[dict]:
    """dict_rows: label_dict rows as dicts with keys entity, name,
    name_norm, language(list), is_alias, description, kind, NERtype,
    types(list), length, ntoken, popularity(normalized)."""
    # dictionary rows are unique on (entity, name, is_alias)
    seen, uniq = set(), []
    for r in dict_rows:
        k = (r["entity"], r["name"], r["is_alias"])
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    dict_rows = uniq

    m = clean_str(mention)
    m_tokens = m.split(" ")
    m_tokset = set(m_tokens)
    nt_m, ln_m = len(m_tokens), len(m)

    def exact_matches():
        out = []
        for r in dict_rows:
            name_toks = set(r["name_norm"].split(" "))
            hit = m_tokset & name_toks
            if hit:
                out.append((r, len(hit), len(hit)))
        return out

    base = exact_matches()

    # mention-level features over the UNfiltered exact token-match set
    ids = {r["entity"] for r, _, _ in base}
    exact_ids = {r["entity"] for r, _, _ in base if r["name_norm"] == m}
    all_tokens = set()
    for r, _, _ in base:
        all_tokens |= set(r["name_norm"].split(" "))
    ambiguity = round(len(exact_ids) / max(len(ids), 1), 3)
    corrects = round(len(m_tokset & all_tokens) / len(m_tokset), 3)

    if fuzzy:
        rows = {}
        for r, exact_cnt, any_cnt in base:
            rows[(r["entity"], r["name"], r["is_alias"])] = (r, exact_cnt, exact_cnt)
        for r in dict_rows:
            name_toks = set(r["name_norm"].split(" "))
            matched_any = set()
            matched_exact = set()
            for mt in m_tokens:
                band = edit_band(mt)
                for dt in name_toks:
                    d = lev(mt, dt)
                    if d == 0:
                        matched_exact.add(mt)
                        matched_any.add(mt)
                    elif d <= band:
                        matched_any.add(mt)
            if matched_any:
                rows[(r["entity"], r["name"], r["is_alias"])] = (
                    r, len(matched_exact), len(matched_any))
        cand = list(rows.values())
    else:
        cand = base

    # filters
    def keep(r):
        if kind is not None and r["kind"] != kind:
            return False
        if ner_type is not None and r["NERtype"] != ner_type:
            return False
        if language is not None and language not in r["language"]:
            return False
        if types is not None and not (set(types.split(" ")) & set(r["types"])):
            return False
        return True

    cand = [(r, e, a) for r, e, a in cand if keep(r)]

    # popularity-desc sort + truncation, deterministic tiebreak
    cand.sort(key=lambda t: (-t[0]["popularity"], t[0]["entity"], t[0]["name"],
                             t[0]["is_alias"]))
    cand = cand[:limit]
    n_hits = len(cand)
    if n_hits == 0:
        return []

    raws = []
    for r, _, any_cnt in cand:
        boost = 2.0 if r["name_norm"] == m else 1.0
        raws.append(boost * any_cnt / max(nt_m, 1))
    max_raw = max(raws)

    out = []
    for i, ((r, _, _), raw) in enumerate(zip(cand, raws)):
        name_clean = r["name_norm"]
        out.append({
            "mention_norm": m,
            "id": r["entity"],
            "name": r["name"],
            "description": r.get("description") or "",
            "types": [{"id": t, "name": type_names.get(t, t)} for t in r["types"]],
            "kind": r["kind"],
            "NERtype": r["NERtype"],
            "ambiguity_mention": ambiguity,
            "corrects_tokens": corrects,
            "ntoken_mention": nt_m,
            "ntoken_entity": r["ntoken"],
            "length_mention": ln_m,
            "length_entity": r["length"],
            "popularity": r["popularity"],
            "pos_score": round((i + 1) / n_hits, 3),
            "es_score": round(raw / max_raw, 3),
            "ed_score": ed_score(name_clean, m),
            "jaccard_score": sim(name_clean, m, None),
            "jaccardNgram_score": sim(name_clean, m, 3),
            "_rank": i + 1,
        })

    # per-id argmax dedup on ed+jaccard; ties -> earliest rank
    best: dict[str, dict] = {}
    for o in out:
        cur = best.get(o["id"])
        if cur is None:
            best[o["id"]] = o
        elif (o["ed_score"] + o["jaccard_score"]) > (cur["ed_score"] + cur["jaccard_score"]):
            best[o["id"]] = o
    final = list(best.values())
    for o in final:
        o.pop("_rank")
    return final
