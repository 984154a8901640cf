"""QuerySpec: the reference's per-connection URL params as a validated spec,
compiled to BOTH a PySpark ``Column`` predicate and an equivalent ANSI-SQL
``WHERE`` clause (for the DuckDB oracle). One compiler, two backends — the
filter algebra cannot drift between the engine and its correctness oracle.

Reference semantics reproduced exactly (SURVEY.md §2.2, /root/reference/sse.py):

- F1 type dispatch (sse.py:56-57,180,223): row suppressed unless ``type`` is
  absent, startswith 'comment'/'submission', or equals 'rc'/'rs'.
- F2/F3 author/subreddit whitelists (sse.py:169-175,208-218): list membership,
  exact-match, CASE-SENSITIVE, commas NOT split (README.md:18 is wrong — Q2).
- F4 domain whitelist (sse.py:198,212-214): first value only, comma-split,
  case-insensitive, submissions only.
- F5 combiner (sse.py:156-159,177,187-190,220): disjunction of F2-F4 with
  vacuous truth when none of author/subreddit/domain present. Quirk Q1: a
  bare ``?domain=x`` blocks ALL comments (comments have no domain match path).
- F6/F7 over_18 / is_self (sse.py:202-206): case-insensitive string equality
  against the stringified boolean; conjunctive; submissions only.
- Q3 deviation (documented): the reference hits an unbound/stale ``domain``
  local when a submission lacks the field (sse.py:213); we treat missing
  domain as non-match.
- V1-V3 (sse.py:49-78): backfill x start_id mutual exclusion, int parsing.
- S3 backfill clamp (sse.py:60-69): N clamped to 100_000 (README's 25_000
  claim for submissions is wrong — Q4; code wins).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_BACKFILL = 100_000  # sse.py:65


class SpecError(ValueError):
    """Maps to the reference's HTTP 400 responses (sse.py:49-78)."""


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _is_int(v: str) -> bool:
    """Reference isInt (sse.py:11-15)."""
    try:
        int(v)
        return True
    except (TypeError, ValueError):
        return False


@dataclass(frozen=True)
class QuerySpec:
    """One reference 'query' = one set of URL params (sse.py:46-78).

    ``authors``/``subreddits`` hold the repeated-param value lists verbatim
    (``?author=a&author=b``); ``domains`` holds the already comma-split,
    lowercased first value — mirroring where the reference does each split.
    """

    type: str | None = None
    authors: tuple[str, ...] = ()
    subreddits: tuple[str, ...] = ()
    domains: tuple[str, ...] = ()  # lowercased, comma-split (sse.py:213)
    over_18: str | None = None  # raw string param (sse.py:202)
    is_self: str | None = None
    filter_keys: tuple[str, ...] = ()  # P2 projection keys (sse.py:234-237)
    comment_backfill: int | None = None
    submission_backfill: int | None = None
    comment_start_id: int | None = None
    submission_start_id: int | None = None

    @classmethod
    def from_params(cls, params: dict[str, list[str]]) -> "QuerySpec":
        """Parse + validate the raw multi-value param dict (sse.py:46-78)."""
        if ("comment_backfill" in params or "submission_backfill" in params) and (
            "comment_start_id" in params or "submission_start_id" in params
        ):
            raise SpecError("backfill and start_id are mutually exclusive")  # V1 sse.py:49-53

        def one(k: str) -> str | None:
            return params[k][0] if k in params and params[k] else None

        def intp(k: str, clamp: int | None = None) -> int | None:
            v = one(k)
            if v is None:
                return None
            if not _is_int(v):
                raise SpecError(f"{k} must be an integer")  # V2/V3 sse.py:60-78
            n = int(v)
            return min(n, clamp) if clamp is not None else n

        domain_raw = one("domain")
        return cls(
            type=one("type"),
            authors=tuple(params.get("author", ())),
            subreddits=tuple(params.get("subreddit", ())),
            domains=tuple(domain_raw.lower().split(",")) if domain_raw else (),
            over_18=one("over_18"),
            is_self=one("is_self"),
            filter_keys=tuple(one("filter").split(",")) if one("filter") else (),
            comment_backfill=intp("comment_backfill", MAX_BACKFILL),  # S3 clamp sse.py:65
            submission_backfill=intp("submission_backfill", MAX_BACKFILL),
            comment_start_id=intp("comment_start_id"),
            submission_start_id=intp("submission_start_id"),
        )

    # ------------------------------------------------------------------ #
    # Predicate compilation — PySpark backend                             #
    # ------------------------------------------------------------------ #

    @property
    def has_whitelist(self) -> bool:
        """sse.py:156-159: default-pass only when NO whitelist param given."""
        return bool(self.authors or self.subreddits or self.domains)

    def _type_match(self, event: str) -> bool:
        """F1: does stream tag `event` ('rc'|'rs') survive the type param?"""
        if self.type is None:
            return True
        t = self.type
        if event == "rc":
            return t.startswith("comment") or t == "rc"  # sse.py:180
        return t.startswith("submission") or t == "rs"  # sse.py:223

    def predicate(self) -> Column:
        """Compile to a single Column over the feed schema
        (id, event, author, subreddit, domain, over_18, is_self, ...)."""
        is_rc = F.col("event") == "rc"

        # F5 whitelist combiner, per entity (Q1: domain term absent for rc).
        if self.has_whitelist:
            wl_terms_rc = []
            wl_terms_rs = []
            if self.authors:  # F2 case-sensitive exact
                wl_terms_rc.append(F.col("author").isin(*self.authors))
                wl_terms_rs.append(F.col("author").isin(*self.authors))
            if self.subreddits:  # F3
                wl_terms_rc.append(F.col("subreddit").isin(*self.subreddits))
                wl_terms_rs.append(F.col("subreddit").isin(*self.subreddits))
            if self.domains:  # F4 — submissions only (Q1)
                wl_terms_rs.append(F.lower(F.col("domain")).isin(*self.domains))
            wl_rc = _any(wl_terms_rc)
            wl_rs = _any(wl_terms_rs)
        else:
            wl_rc = wl_rs = F.lit(True)

        pred_rs = wl_rs
        # F6/F7: conjunctive, case-insensitive string equality, rs only.
        if self.over_18 is not None:
            pred_rs = pred_rs & (
                F.lower(F.col("over_18").cast("string")) == self.over_18.lower()
            )
        if self.is_self is not None:
            pred_rs = pred_rs & (
                F.lower(F.col("is_self").cast("string")) == self.is_self.lower()
            )

        pred = F.when(is_rc, wl_rc).otherwise(pred_rs)

        # F1 type dispatch (applied last, matching reference row order).
        if self.type is not None:
            type_pred = F.lit(False)
            if self._type_match("rc"):
                type_pred = type_pred | is_rc
            if self._type_match("rs"):
                type_pred = type_pred | ~is_rc
            pred = pred & type_pred
        return pred

    # ------------------------------------------------------------------ #
    # Predicate compilation — ANSI SQL backend (DuckDB oracle)            #
    # ------------------------------------------------------------------ #

    def predicate_sql(self) -> str:
        """Same algebra as :meth:`predicate`, as a SQL boolean expression."""
        if self.has_whitelist:
            rc_terms, rs_terms = [], []
            if self.authors:
                m = f"author IN ({', '.join(_sql_quote(a) for a in self.authors)})"
                rc_terms.append(m)
                rs_terms.append(m)
            if self.subreddits:
                m = f"subreddit IN ({', '.join(_sql_quote(s) for s in self.subreddits)})"
                rc_terms.append(m)
                rs_terms.append(m)
            if self.domains:
                rs_terms.append(
                    f"lower(domain) IN ({', '.join(_sql_quote(d) for d in self.domains)})"
                )
            wl_rc = "(" + " OR ".join(rc_terms) + ")" if rc_terms else "FALSE"
            wl_rs = "(" + " OR ".join(rs_terms) + ")" if rs_terms else "FALSE"
        else:
            wl_rc = wl_rs = "TRUE"

        rs_conj = [wl_rs]
        if self.over_18 is not None:
            rs_conj.append(
                f"lower(CAST(over_18 AS VARCHAR)) = {_sql_quote(self.over_18.lower())}"
            )
        if self.is_self is not None:
            rs_conj.append(
                f"lower(CAST(is_self AS VARCHAR)) = {_sql_quote(self.is_self.lower())}"
            )
        pred = f"(CASE WHEN event = 'rc' THEN {wl_rc} ELSE ({' AND '.join(rs_conj)}) END)"

        if self.type is not None:
            opts = []
            if self._type_match("rc"):
                opts.append("event = 'rc'")
            if self._type_match("rs"):
                opts.append("event = 'rs'")
            type_pred = "(" + " OR ".join(opts) + ")" if opts else "FALSE"
            pred = f"({pred} AND {type_pred})"
        return pred


    # ------------------------------------------------------------------ #
    # Predicate compilation — Python-row backend (serving-layer fan-out)  #
    # ------------------------------------------------------------------ #

    def predicate_py_pre_type(self):
        """Row-level predicate for the SSE broadcaster's per-client fan-out
        (everything EXCEPT the F1 type filter, which the sink applies after
        incrementing counters — the A1 ordering quirk, sse.py:179-180).

        Accepts any mapping-like row (pyspark Row or dict)."""

        def pred(row) -> bool:
            if row["event"] == "rc":
                if not self.has_whitelist:
                    return True
                return row["author"] in self.authors or row["subreddit"] in self.subreddits
            if self.over_18 is not None:
                v = row["over_18"]
                if v is None or str(v).lower() != self.over_18.lower():
                    return False
            if self.is_self is not None:
                v = row["is_self"]
                if v is None or str(v).lower() != self.is_self.lower():
                    return False
            if not self.has_whitelist:
                return True
            if row["author"] in self.authors or row["subreddit"] in self.subreddits:
                return True
            d = row["domain"]
            return d is not None and d.lower() in self.domains  # Q3 deviation

        return pred

    def type_match_py(self):
        """F1 as a Python predicate over the stream tag."""
        return self._type_match


def _any(terms: list[Column]) -> Column:
    if not terms:
        return F.lit(False)
    out = terms[0]
    for t in terms[1:]:
        out = out | t
    return out
