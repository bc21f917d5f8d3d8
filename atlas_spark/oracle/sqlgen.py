"""ASL expression -> DuckDB oracle SQL.

The Spark-native analogue of the reference's ASL->SQL translation
(`atlas-postgres/.../SqlUtils.scala:176-238`): WHERE from the Query tree,
GROUP BY from `:by`, aggregate fn from the DataExpr, window functions for
the stateful vocabulary.

Every generated statement selects columns `[<key cols...>, t, value]` from
a `dp` CTE (provided by the DatapointSource) so the driver can hash-compare
the Spark result with the DuckDB result.  Generated SQL mirrors the
*declared semantics* (dense step grid, null = no data) — it is the
independent re-implementation used as the correctness oracle.
"""

from __future__ import annotations

from ..model import expr as E
from ..model import query as Q
from ..plans.context import EvalContext
from ..sources.datapoints import sanitize


def query_where(q: Q.Query, col=lambda k: sanitize(k)) -> str:
    """Query AST -> SQL boolean expression (NULL-safe: missing key never
    matches, including under :not)."""

    def esc(v: str) -> str:
        return "'" + v.replace("'", "''") + "'"

    def go(q: Q.Query) -> str:
        if isinstance(q, Q.TrueQuery):
            return "TRUE"
        if isinstance(q, Q.FalseQuery):
            return "FALSE"
        if isinstance(q, Q.HasKeyQuery):
            return f"{col(q.k)} IS NOT NULL"
        if isinstance(q, Q.EqualQuery):
            return f"{col(q.k)} = {esc(q.v)}"
        if isinstance(q, Q.LessThanQuery):
            return f"{col(q.k)} < {esc(q.v)}"
        if isinstance(q, Q.LessThanEqualQuery):
            return f"{col(q.k)} <= {esc(q.v)}"
        if isinstance(q, Q.GreaterThanQuery):
            return f"{col(q.k)} > {esc(q.v)}"
        if isinstance(q, Q.GreaterThanEqualQuery):
            return f"{col(q.k)} >= {esc(q.v)}"
        if isinstance(q, Q.RegexQuery):
            return f"regexp_matches({col(q.k)}, {esc('^' + q.v)})"
        if isinstance(q, Q.RegexIgnoreCaseQuery):
            return f"regexp_matches({col(q.k)}, {esc('(?i)^' + q.v)})"
        if isinstance(q, Q.InQuery):
            vs = ", ".join(esc(v) for v in q.vs)
            return f"{col(q.k)} IN ({vs})"
        if isinstance(q, Q.AndQuery):
            return f"({go(q.q1)} AND {go(q.q2)})"
        if isinstance(q, Q.OrQuery):
            return f"({go(q.q1)} OR {go(q.q2)})"
        if isinstance(q, Q.NotQuery):
            return f"(NOT COALESCE({go(q.q)}, FALSE))"
        raise TypeError(f"unknown query node {q!r}")

    return f"COALESCE({go(q)}, FALSE)"


_AGG_SQL = {
    "sum": "sum({v})",
    "count": "count({v})",
    "min": "min({v})",
    "max": "max({v})",
    "avg": "avg({v})",  # :topk-others-avg / :bottomk-others-avg
}

_STAT_SQL = {
    "avg": "avg({v})",
    "max": "max({v})",
    "min": "min({v})",
    "last": "last({v} ORDER BY t) FILTER (WHERE {v} IS NOT NULL)",
    "total": "sum({v})",
    "count": "count({v})",
}


class SqlGen:
    """Generates one SELECT per expression node, composed as chained CTEs."""

    def __init__(
        self,
        dp_cte: str,
        ctx: EvalContext,
        src_step: int | None = None,
        ds_type: str = "rate",
        all_key_cols: tuple[str, ...] = ("k_name", "k_bucket"),
    ):
        self.dp_cte = dp_cte
        self.ctx = ctx
        # storage step of the dp relation; when ctx.step is coarser the
        # data exprs consolidate onto the ctx grid (DataExpr.scala:52-59)
        self.src_step = src_step or ctx.step
        self.ds_type = ds_type
        # key columns of the dp relation, for `:all` (every series)
        self.all_key_cols = list(all_key_cols)
        self._ctes: list[tuple[str, str]] = []
        self._n = 0
        self._recursive = False

    def _add(self, sql: str) -> str:
        self._n += 1
        name = f"x{self._n}"
        self._ctes.append((name, sql))
        return name

    def _wrap(self, rel: str, sql: str) -> str:
        """_add + zero-LINES propagation: any per-line transform of a
        relation known to have zero lines still has zero lines — without
        this, a downstream densify would manufacture a grid line for a
        result the reference defines as empty (FilterExpr.scala:69-87)."""
        out = self._add(sql)
        if rel in self._empty:
            self._empty.add(out)
        return out

    # ------------------------------------------------------------------ api

    def generate(self, e: E.TimeSeriesExpr, drop_nulls: bool = True) -> str:
        """Full SQL statement for the expression result."""
        self._ctes = [("dp", self.dp_cte)]
        self._n = 0
        self._recursive = False
        # relations known to have zero LINES (standalone :stat-*); densify
        # must not manufacture a grid line for them (FilterExpr.scala:69-87)
        self._empty: set[str] = set()
        rel, keys = self._gen(e)
        cols = ", ".join(list(keys) + ["t", "value"])
        where = "WHERE value IS NOT NULL" if drop_nulls else ""
        ctes = ",\n".join(f"{n} AS ({s})" for n, s in self._ctes)
        kw = "WITH RECURSIVE" if self._recursive else "WITH"
        return f"{kw} {ctes}\nSELECT {cols} FROM {rel} {where}"

    # ------------------------------------------------------------- internals

    def _grid(self) -> str:
        c = self.ctx
        # whole steps only: EvalContext.n_steps floors (end-start)/step, so
        # a window that is not a step multiple must NOT grow a partial
        # trailing grid cell here (DuckDB range() would emit one)
        end = c.start + c.n_steps * c.step
        return self._add(
            f"SELECT unnest(range({c.start}, {end}, {c.step})) AS t"
        )

    def _densify(self, rel: str, keys: list[str]) -> str:
        if rel in self._empty:
            return rel  # zero lines stay zero lines
        g = self._grid()
        if keys:
            ks = ", ".join(keys)
            kd = self._add(f"SELECT DISTINCT {ks} FROM {rel}")
            return self._add(
                f"SELECT k.*, g.t, r.value FROM {kd} k CROSS JOIN {g} g "
                f"LEFT JOIN {rel} r USING ({ks}, t)"
            )
        return self._add(
            f"SELECT g.t, r.value FROM {g} g LEFT JOIN {rel} r USING (t)"
        )

    # default cf per aggregate fn when fetching at a coarser step than
    # storage (DataExpr.scala:173,197: Sum/Count default Avg; Min/Max self)
    _CF_DEFAULT = {"sum": "avg", "count": "avg", "min": "min", "max": "max"}

    def _consolidate_rel(self, rel: str, keys: list[str], cf: str) -> str:
        """Time-consolidate storage-step cells to the ctx grid.  `avg`
        divides by the sub-interval count for rates, by the non-null
        sample count for gauges (TimeSeq.scala:203-210)."""
        c = self.ctx
        m = c.step // self.src_step
        tc = f"{c.start} + ((t - {c.start}) - (t - {c.start}) % {c.step})"
        if cf == "avg":
            agg = (
                "avg(value)"
                if self.ds_type == "gauge"
                else f"sum(value) / {float(m)!r}"
            )
        else:
            agg = _AGG_SQL[cf].format(v="value")
        sel = keys + [f"{tc} AS t", f"{agg} AS value"]
        grp = keys + [tc]
        return self._add(
            f"SELECT {', '.join(sel)} FROM {rel} GROUP BY {', '.join(grp)}"
        )

    def _gen(self, e: E.TimeSeriesExpr) -> tuple[str, list[str]]:
        """Returns (relation name, key column list); relation is sparse
        unless produced dense."""
        c = self.ctx
        consolidating = c.step > self.src_step

        if isinstance(e, E.GroupByExpr):
            keys = [sanitize(k) for k in e.keys]
            where = query_where(e.query)
            off = (e.af.offset // c.step) * c.step  # whole steps, seconds
            tsel = f"t + {off}" if off else "t"
            lo, hi = c.start - off, c.end - off
            agg = _AGG_SQL[e.af.fn].format(v="value")
            notnull = " AND ".join(f"{k} IS NOT NULL" for k in keys)
            rel = self._add(
                f"SELECT {', '.join(keys)}, {tsel} AS t, {agg} AS value FROM dp "
                f"WHERE t >= {lo} AND t < {hi} AND {where} AND {notnull} "
                f"GROUP BY {', '.join(keys)}, t"
            )
            if consolidating:
                rel = self._consolidate_rel(
                    rel, keys, e.af.cf or self._CF_DEFAULT[e.af.fn]
                )
            return rel, keys

        if isinstance(e, E.AggrExpr):
            where = query_where(e.query)
            off = (e.offset // c.step) * c.step  # whole steps, seconds
            tsel = f"t + {off}" if off else "t"
            lo, hi = c.start - off, c.end - off
            agg = _AGG_SQL[e.fn].format(v="value")
            rel = self._add(
                f"SELECT {tsel} AS t, {agg} AS value FROM dp "
                f"WHERE t >= {lo} AND t < {hi} AND {where} GROUP BY t"
            )
            if consolidating:
                rel = self._consolidate_rel(rel, [], e.cf or self._CF_DEFAULT[e.fn])
            return rel, []

        if isinstance(e, E.AllExpr):
            where = query_where(e.query)
            rel = self._add(
                f"SELECT * FROM dp WHERE t >= {c.start} AND t < {c.end} AND {where}"
            )
            if consolidating:
                rel = self._consolidate_rel(rel, self.all_key_cols, "sum")
            return rel, self.all_key_cols

        if isinstance(e, E.ConstExpr):
            g = self._grid()
            rel = self._add(f"SELECT t, CAST({e.v!r} AS DOUBLE) AS value FROM {g}")
            return rel, []

        if isinstance(e, E.StatPlaceholder):
            # standalone :stat-* -> empty result set (FilterExpr.scala:69-87)
            rel = self._add(
                "SELECT CAST(NULL AS BIGINT) AS t, CAST(NULL AS DOUBLE) AS value "
                "WHERE false"
            )
            self._empty.add(rel)
            return rel, []

        if isinstance(e, E.TimeExpr):
            g = self._grid()
            expr = _time_sql(e.mode)
            rel = self._add(f"SELECT t, CAST({expr} AS DOUBLE) AS value FROM {g}")
            return rel, []

        if isinstance(e, E.RandomExpr):
            # identical md5-derived noise as the engine (builder._random_col)
            g = self._grid()
            idx = f"CAST(t // {c.step} + {e.seed} AS VARCHAR)"
            h = f"('0x' || substr(md5({idx}), 1, 15))::BIGINT"
            rel = self._add(
                f"SELECT t, CAST(({h} % 1000000 + 1000000) % 1000000 / 1000000.0 AS DOUBLE) AS value FROM {g}"
            )
            return rel, []

        if isinstance(e, E.TimeSpanExpr):
            from ..util.strings import time_range

            s, t_end = time_range(e.s, e.e, c, zone=e.zone)
            g = self._grid()
            rel = self._add(
                f"SELECT t, CASE WHEN t >= {s} AND t <= {t_end} THEN 1.0 ELSE 0.0 END AS value FROM {g}"
            )
            return rel, []

        if isinstance(e, E.UnaryMathExpr):
            rel, keys = self._gen(e.expr)
            expr = _unary_sql(e.op, "value", e.param, c.step)
            out = self._wrap(
                rel,
                f"SELECT {', '.join(keys + ['t'])}, CAST({expr} AS DOUBLE) AS value FROM {rel}",
            )
            return out, keys

        if isinstance(e, E.BinaryMathExpr):
            return self._gen_binary(e)

        if isinstance(e, E.AggrMathExpr):
            rel, _ = self._gen(e.expr)
            agg = _AGG_SQL[e.fn].format(v="value")
            out = self._wrap(rel, f"SELECT t, {agg} AS value FROM {rel} GROUP BY t")
            return out, []

        if isinstance(e, E.MathGroupByExpr):
            rel, _ = self._gen(e.af.expr)
            keys = [sanitize(k) for k in e.keys]
            agg = _AGG_SQL[e.af.fn].format(v="value")
            out = self._wrap(
                rel,
                f"SELECT {', '.join(keys)}, t, {agg} AS value FROM {rel} "
                f"GROUP BY {', '.join(keys)}, t",
            )
            return out, keys

        if isinstance(e, E.AsExpr):
            rel, keys = self._gen(e.expr)
            old, new = sanitize(e.orig), sanitize(e.repl)
            if old not in keys:
                return rel, keys
            sel = [f"{k} AS {new}" if k == old else k for k in keys]
            out = self._wrap(rel, f"SELECT {', '.join(sel)}, t, value FROM {rel}")
            return out, [new if k == old else k for k in keys]

        if isinstance(e, E.NamedRewrite):
            return self._gen(e.evaluated)

        if isinstance(e, E.ApproxDistinctExpr):
            return self._gen_approx_distinct(e)

        if isinstance(e, E.PercentilesExpr):
            return self._gen_percentiles(e)

        if isinstance(e, E.SampleCountExpr):
            return self._gen_sample_count(e)

        if isinstance(e, E.StatefulMathExpr):
            return self._gen_stateful(e)

        if isinstance(e, E.StatExpr):
            rel, keys = self._gen(e.expr)
            part = f"PARTITION BY {', '.join(keys)}" if keys else ""
            stat = _stat_over(e.stat, part)
            out = self._wrap(
                rel,
                f"SELECT {', '.join(keys + ['t'])}, CAST({stat} AS DOUBLE) AS value FROM {rel}",
            )
            return out, keys

        if isinstance(e, E.FilterOpExpr):
            return self._gen_filter(e)

        if isinstance(e, E.TopKExpr):
            return self._gen_topk(e)

        if isinstance(e, E.ConsolidateExpr):
            rel, keys = self._gen(e.expr)
            m = e.multiple
            ns = m * c.step
            tc = f"{c.start} + ((t - {c.start}) - (t - {c.start}) % {ns})"
            if e.cf == "avg":
                # gauge: non-null sample count denominator; rate: the
                # sub-interval count (TimeSeq.scala:203-210)
                agg = (
                    "avg(value)"
                    if self.ds_type == "gauge"
                    else f"sum(value) / {float(m)!r}"
                )
            else:
                agg = _AGG_SQL[e.cf].format(v="value")
            sel = keys + [f"{tc} AS t", f"{agg} AS value"]
            grp = keys + [tc]
            out = self._wrap(
                rel, f"SELECT {', '.join(sel)} FROM {rel} GROUP BY {', '.join(grp)}"
            )
            return out, keys

        if isinstance(e, E.StyleExpr):
            rel, keys = self._gen(e.expr)
            s = e.settings_dict()
            if keys and ("sort" in s or "limit" in s):
                stat = s.get("sort", "max")
                if stat not in _STAT_SQL:
                    stat = "max"
                direction = "ASC NULLS LAST" if s.get("order") == "asc" else "DESC NULLS LAST"
                ks = ", ".join(keys)
                tie = ", ".join(f"{k} ASC" for k in keys)
                agg = _STAT_SQL[stat].format(v="value")
                ranked = self._add(
                    f"SELECT {ks}, row_number() OVER (ORDER BY {agg} {direction}, {tie}) AS rn "
                    f"FROM {rel} GROUP BY {ks}"
                )
                lim = f"WHERE rn <= {int(s['limit'])}" if "limit" in s else ""
                top = self._add(f"SELECT {ks} FROM {ranked} {lim}")
                rel = self._add(
                    f"SELECT r.* FROM {rel} r SEMI JOIN {top} USING ({ks})"
                )
            return rel, keys

        raise TypeError(f"sqlgen: cannot handle {type(e).__name__}")

    _STRICT_OPS = frozenset({"mul", "div", "fmul", "fdiv", "fadd", "fsub"})

    def _gen_binary(self, e: E.BinaryMathExpr) -> tuple[str, list[str]]:
        r1, k1 = self._gen(e.lhs)
        r2, k2 = self._gen(e.rhs)
        if e.op in self._STRICT_OPS:
            # missing input -> missing output: sparse inner join suffices
            # (mirrors the plan builder's strict-op shortcut)
            d1, d2 = r1, r2
        else:
            d1 = self._densify(r1, k1)
            d2 = self._densify(r2, k2)
        if set(k1) <= set(k2):
            sup_rel, sup_keys, sub_rel, sub_keys, flipped = d2, k2, d1, k1, True
        else:
            sup_rel, sup_keys, sub_rel, sub_keys, flipped = d1, k1, d2, k2, False
        on = " AND ".join([f"a.{k} = b.{k}" for k in sub_keys] + ["a.t = b.t"])
        a_val, b_val = ("b.value", "a.value") if flipped else ("a.value", "b.value")
        expr = _binary_sql(e.op, a_val, b_val)
        cols = ", ".join([f"a.{k}" for k in sup_keys] + ["a.t"])
        # inner join: lines whose common key has no match on the other side
        # are dropped (MathExpr.scala:552-575 "case null => Nil")
        out = self._add(
            f"SELECT {cols}, CAST({expr} AS DOUBLE) AS value "
            f"FROM {sup_rel} a JOIN {sub_rel} b ON {on}"
        )
        if r1 in self._empty or r2 in self._empty:
            self._empty.add(out)
        return out, sup_keys

    def _gen_stateful(self, e: E.StatefulMathExpr) -> tuple[str, list[str]]:
        rel, keys = self._gen(e.expr)
        d = self._densify(rel, keys)
        part = f"PARTITION BY {', '.join(keys)} " if keys else ""
        w = f"OVER ({part}ORDER BY t"
        p = e.params
        op = e.op
        if op == "delay":
            expr = f"lag(value, {int(p[0])}) {w})"
        elif op == "rolling-count":
            cond = "CASE WHEN value IS NOT NULL AND abs(value) >= 1e-12 THEN 1 ELSE 0 END"
            expr = f"sum({cond}) {w} ROWS BETWEEN {int(p[0]) - 1} PRECEDING AND CURRENT ROW)"
        elif op in ("rolling-min", "rolling-max", "rolling-sum"):
            fn = {"rolling-min": "min", "rolling-max": "max", "rolling-sum": "sum"}[op]
            expr = f"{fn}(value) {w} ROWS BETWEEN {int(p[0]) - 1} PRECEDING AND CURRENT ROW)"
        elif op == "rolling-mean":
            n, mn = int(p[0]), int(p[1])
            win = f"{w} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
            expr = f"CASE WHEN count(value) {win} >= {mn} THEN avg(value) {win} END"
        elif op == "trend":
            # sum / window size with fill warm-up (OnlineTrend.scala:33-49)
            n = max(1, int(p[0]) // self.ctx.step)
            win = f"{w} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
            expr = (
                f"CASE WHEN count(*) {win} >= {n} AND count(value) {win} > 0 "
                f"THEN sum(value) {win} / {float(n)!r} END"
            )
        elif op == "integral":
            expr = f"sum(value) {w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        elif op == "cumulative-max":
            expr = f"max(value) {w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        elif op == "derivative":
            expr = f"value - lag(value, 1) {w})"
        elif op in ("des", "sdes"):
            out = self._gen_des(
                d, keys, int(p[0]), float(p[1]), float(p[2]), sliding=(op == "sdes")
            )
            if rel in self._empty:
                self._empty.add(out)  # zero lines stay zero lines
            return out, keys
        else:
            raise TypeError(f"sqlgen: stateful op {op} has no SQL oracle")
        out = self._wrap(
            rel, f"SELECT {', '.join(keys + ['t'])}, CAST({expr} AS DOUBLE) AS value FROM {d}"
        )
        return out, keys

    @staticmethod
    def _des_update(cur: str, sp: str, bp: str, alpha: float, beta: float):
        """SQL fragments for one OnlineDes state transition given the value
        column `v` (NULL = NaN; NaN inputs do not advance the state)."""
        sn = f"({alpha!r} * v + {1 - alpha!r} * ({sp} + {bp}))"
        new_cur = f"CASE WHEN v IS NULL THEN {cur} ELSE {cur} + 1 END"
        new_sp = (
            f"CASE WHEN v IS NULL THEN {sp} WHEN {cur} = 0 THEN v ELSE {sn} END"
        )
        new_bp = (
            f"CASE WHEN v IS NULL THEN {bp} WHEN {cur} = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE {beta!r} * ({sn} - {sp}) + {1 - beta!r} * {bp} END"
        )
        return new_cur, new_sp, new_bp

    def _gen_des(
        self, d: str, keys: list[str], n: int, alpha: float, beta: float, sliding: bool
    ) -> str:
        """DES / sliding DES as a recursive CTE carrying the OnlineDes
        state (count, smoothed, trend) per series per step — the exact
        recurrence of `plans/builder._Des` (OnlineDes.scala:28-52;
        sliding: two staggered instances, OnlineSlidingDes.scala)."""
        self._recursive = True
        c = self.ctx
        n_steps = (c.end - c.start) // c.step
        kl = ", ".join(keys)
        kd = ", ".join(f"d.{k}" for k in keys)
        on = " AND ".join([f"d.{k} = g.{k}" for k in keys] + ["g.i = d.i"])
        grid = self._add(
            f"SELECT {kl + ', ' if keys else ''}CAST((t - {c.start}) / {c.step} AS BIGINT) AS i, "
            f"t, value AS v FROM {d}"
        )
        self._n += 1
        name = f"des_{self._n}"
        null_d = "CAST(NULL AS DOUBLE)"
        u_cur, u_sp, u_bp = self._des_update("d.cur", "d.sp", "d.bp", alpha, beta)
        if not sliding:
            anchor = (
                f"SELECT DISTINCT {kl + ', ' if keys else ''}0 AS i, 0 AS cur, "
                f"{null_d} AS sp, CAST(0.0 AS DOUBLE) AS bp FROM {grid} WHERE i = 0"
            )
            step = (
                f"SELECT {kd + ', ' if keys else ''}d.i + 1 AS i, "
                f"{u_cur} AS cur, {u_sp} AS sp, {u_bp} AS bp "
                f"FROM {name} d JOIN {grid} g ON {on} WHERE d.i + 1 < {n_steps}"
            )
            self._ctes.append((name, f"{anchor} UNION ALL {step}"))
            ret = f"CASE WHEN s.cur >= {n} THEN s.sp END"
        else:
            u2_cur, u2_sp, u2_bp = self._des_update("d.cur2", "d.sp2", "d.bp2", alpha, beta)
            swap = f"(d.i + 1) % {n} = 0"  # reset active instance, then swap
            anchor = (
                f"SELECT DISTINCT {kl + ', ' if keys else ''}0 AS i, "
                f"0 AS cur, {null_d} AS sp, CAST(0.0 AS DOUBLE) AS bp, "
                f"0 AS cur2, {null_d} AS sp2, CAST(0.0 AS DOUBLE) AS bp2, TRUE AS use1 "
                f"FROM {grid} WHERE i = 0"
            )
            step = (
                f"SELECT {kd + ', ' if keys else ''}d.i + 1 AS i, "
                f"CASE WHEN {swap} AND d.use1 THEN 0 ELSE {u_cur} END AS cur, "
                f"CASE WHEN {swap} AND d.use1 THEN {null_d} ELSE {u_sp} END AS sp, "
                f"CASE WHEN {swap} AND d.use1 THEN CAST(0.0 AS DOUBLE) ELSE {u_bp} END AS bp, "
                f"CASE WHEN {swap} AND NOT d.use1 THEN 0 ELSE {u2_cur} END AS cur2, "
                f"CASE WHEN {swap} AND NOT d.use1 THEN {null_d} ELSE {u2_sp} END AS sp2, "
                f"CASE WHEN {swap} AND NOT d.use1 THEN CAST(0.0 AS DOUBLE) ELSE {u2_bp} END AS bp2, "
                f"CASE WHEN {swap} THEN NOT d.use1 ELSE d.use1 END AS use1 "
                f"FROM {name} d JOIN {grid} g ON {on} WHERE d.i + 1 < {n_steps}"
            )
            self._ctes.append((name, f"{anchor} UNION ALL {step}"))
            ret = (
                f"CASE WHEN s.use1 THEN (CASE WHEN s.cur >= {n} THEN s.sp END) "
                f"ELSE (CASE WHEN s.cur2 >= {n} THEN s.sp2 END) END"
            )
        on_out = " AND ".join([f"s.{k} = g.{k}" for k in keys] + ["s.i = g.i"])
        kg = ", ".join(f"g.{k}" for k in keys)
        return self._add(
            f"SELECT {kg + ', ' if keys else ''}g.t, CAST({ret} AS DOUBLE) AS value "
            f"FROM {grid} g JOIN {name} s ON {on_out}"
        )

    def _pct_indexed_sql(self, e) -> tuple[str, list[str]]:
        from ..functions.percentile_buckets import boundaries_sql_array

        rel, keys = self._gen(e.expr)
        ek = [k for k in keys if k != "k_percentile"]
        arr = boundaries_sql_array()
        idx = "CAST('0x' || substr(k_percentile, 2, 4) AS INTEGER)"
        prepped = self._add(
            f"SELECT {', '.join(ek + ['t'])}, {idx} AS idx, "
            f"substr(k_percentile, 1, 1) = 'T' AS timer, "
            f"list_extract({arr}, {idx} + 1) AS bval, value "
            f"FROM {rel} WHERE k_percentile IS NOT NULL AND value IS NOT NULL AND value > 0"
        )
        return prepped, ek

    def _gen_percentiles(self, e: E.PercentilesExpr) -> tuple[str, list[str]]:
        from ..functions.percentile_buckets import boundaries_sql_array, pct_label

        prepped, ek = self._pct_indexed_sql(e)
        part = ", ".join(ek + ["t"])
        win = self._add(
            f"SELECT *, "
            f"sum(value) OVER (PARTITION BY {part} ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            f"sum(value) OVER (PARTITION BY {part}) AS total, "
            f"CASE WHEN idx = 0 THEN 0.0 ELSE CAST(list_extract({boundaries_sql_array()}, idx) AS DOUBLE) END AS prev_b "
            f"FROM {prepped}"
        )
        pvals = ", ".join(
            f"({float(p)!r}, '{pct_label(p)}')" for p in sorted(set(e.pcts))
        )
        pcts = self._add(f"SELECT * FROM (VALUES {pvals}) AS pv(p, plabel)")
        est = (
            "prev_b + (CASE WHEN next_p = prev_p THEN 0.0 "
            "ELSE (p - prev_p) / (next_p - prev_p) END) * (CAST(bval AS DOUBLE) - prev_b)"
        )
        crossed = self._add(
            f"SELECT {', '.join(ek + ['t'])}, p, plabel, idx, timer, prev_b, CAST(bval AS DOUBLE) AS bval, "
            f"100.0 * (cum - value) / total AS prev_p, 100.0 * cum / total AS next_p "
            f"FROM {win} CROSS JOIN {pcts} "
            f"WHERE 100.0 * (cum - value) / total <= p AND p <= 100.0 * cum / total "
            f"QUALIFY row_number() OVER (PARTITION BY {part}, p ORDER BY idx) = 1"
        )
        out = self._add(
            f"SELECT {', '.join(ek + ['plabel AS k_percentile', 't'])}, "
            f"CAST(CASE WHEN timer THEN ({est}) * 1e-9 ELSE {est} END AS DOUBLE) AS value "
            f"FROM {crossed}"
        )
        return out, ek + ["k_percentile"]

    def _gen_approx_distinct(self, e: E.ApproxDistinctExpr) -> tuple[str, list[str]]:
        from ..functions.distinct_sketch import ALPHA, M

        rel, keys = self._gen(e.expr)
        ek = [k for k in keys if k != "k_distinct"]
        cols = ", ".join(ek + ["t"])
        agg = self._add(
            f"SELECT {cols}, sum(pow(2.0, -value)) AS sp, count(*) AS n "
            f"FROM {rel} WHERE k_distinct IS NOT NULL AND value IS NOT NULL AND value > 0 "
            f"GROUP BY {cols}"
        )
        e_raw = f"({ALPHA * M * M!r} / (sp + ({M} - n)))"
        est = (
            f"CASE WHEN {e_raw} <= {2.5 * M} AND ({M} - n) > 0 "
            f"THEN {M} * ln({float(M)!r} / ({M} - n)) ELSE {e_raw} END"
        )
        out = self._add(
            f"SELECT {cols}, CAST({est} AS DOUBLE) AS value FROM {agg}"
        )
        return out, ek

    def _gen_sample_count(self, e: E.SampleCountExpr) -> tuple[str, list[str]]:
        import math as _math

        from ..functions.percentile_buckets import index_of

        prepped, ek = self._pct_indexed_sql(e)
        lo_idx = index_of(_math.ceil(e.lo)) if e.lo > 0 else 0
        hi_idx = index_of(_math.ceil(e.hi)) if _math.isfinite(e.hi) else 1 << 30
        cols = ", ".join(ek + ["t"])
        out = self._add(
            f"SELECT {cols}, sum(value) AS value FROM {prepped} "
            f"WHERE idx >= {lo_idx} AND idx < {hi_idx} GROUP BY {cols}"
        )
        return out, ek

    def _gen_filter(self, e: E.FilterOpExpr) -> tuple[str, list[str]]:
        # resolve :stat-* placeholders against the filtered expression
        def resolve(p):
            if isinstance(p, E.StatPlaceholder):
                return E.StatExpr(e.expr, p.stat)
            if isinstance(p, E.BinaryMathExpr):
                return E.BinaryMathExpr(p.op, resolve(p.lhs), resolve(p.rhs))
            if isinstance(p, E.UnaryMathExpr):
                return E.UnaryMathExpr(p.op, resolve(p.expr), p.param)
            return p

        rel, keys = self._gen(e.expr)
        prel, pkeys = self._gen(resolve(e.pred))
        truthy = "value IS NOT NULL AND abs(value) >= 1e-12"
        if pkeys:
            keep = self._add(f"SELECT DISTINCT {', '.join(pkeys)} FROM {prel} WHERE {truthy}")
            out = self._add(
                f"SELECT r.* FROM {rel} r SEMI JOIN {keep} k USING ({', '.join(pkeys)})"
            )
            return out, keys
        out = self._add(
            f"SELECT r.* FROM {rel} r WHERE EXISTS (SELECT 1 FROM {prel} WHERE {truthy})"
        )
        return out, keys

    def _gen_topk(self, e: E.TopKExpr) -> tuple[str, list[str]]:
        rel, keys = self._gen(e.expr)
        ks = ", ".join(keys)
        stat = _STAT_SQL[e.stat].format(v="value")
        direction = "ASC NULLS LAST" if e.bottom else "DESC NULLS LAST"
        tie = ", ".join(f"{k} ASC" for k in keys)
        ranked = self._add(
            f"SELECT {ks}, row_number() OVER (ORDER BY {stat} {direction}, {tie}) AS rn "
            f"FROM {rel} GROUP BY {ks}"
        )
        top = self._add(f"SELECT {ks} FROM {ranked} WHERE rn <= {e.k}")
        kept = self._add(f"SELECT r.* FROM {rel} r SEMI JOIN {top} USING ({ks})")
        if not e.others:
            return kept, keys
        others_agg = _AGG_SQL[e.others].format(v="value")
        others = self._add(
            f"SELECT {', '.join([chr(39) + '--others--' + chr(39) + ' AS ' + k for k in keys])}, t, "
            f"{others_agg} AS value FROM {rel} r ANTI JOIN {top} USING ({ks}) GROUP BY t"
        )
        out = self._add(f"SELECT * FROM {kept} UNION ALL SELECT * FROM {others}")
        return out, keys

    # top-k stat is computed over an aggregate subquery; fix the ORDER BY
    # aggregate expression formatting above (uses {v} template directly).


def _stat_over(stat: str, part: str) -> str:
    w = f"OVER ({part})"
    if stat == "last":
        return f"last_value(value IGNORE NULLS) OVER ({part} ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    fn = {"avg": "avg", "max": "max", "min": "min", "total": "sum", "count": "count"}[stat]
    return f"{fn}(value) {w}"


def _unary_sql(op: str, v: str, param, step: int) -> str:
    if op == "abs":
        return f"abs({v})"
    if op == "neg":
        return f"-{v}"
    if op == "sin":
        return f"sin({v})"
    if op == "sqrt":
        # java Math.sqrt(negative) = NaN; DuckDB sqrt raises instead
        return f"CASE WHEN {v} < 0 THEN CAST('NaN' AS DOUBLE) ELSE sqrt({v}) END"
    if op == "per-step":
        return f"{v} * {float(step)!r}"
    if op == "clamp-min":
        return f"CASE WHEN {v} IS NULL THEN NULL WHEN {v} < {param!r} THEN {param!r} ELSE {v} END"
    if op == "clamp-max":
        return f"CASE WHEN {v} IS NULL THEN NULL WHEN {v} > {param!r} THEN {param!r} ELSE {v} END"
    raise ValueError(op)


def _binary_sql(op: str, a: str, b: str) -> str:
    if op == "add":
        return f"CASE WHEN {a} IS NULL THEN {b} WHEN {b} IS NULL THEN {a} ELSE {a} + {b} END"
    if op == "sub":
        return f"CASE WHEN {a} IS NULL THEN -{b} WHEN {b} IS NULL THEN {a} ELSE {a} - {b} END"
    if op == "mul":
        return f"{a} * {b}"
    if op == "div":
        return (
            f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL "
            f"WHEN {b} = 0 AND {a} = 0 THEN 0.0 WHEN {b} = 0 THEN NULL "
            f"ELSE {a} / {b} END"
        )
    if op == "pow":
        return f"CASE WHEN {b} = 0 THEN 1.0 ELSE pow({a}, {b}) END"
    if op in ("gt", "ge", "lt", "le"):
        sym = {"gt": ">", "ge": ">=", "lt": "<", "le": "<="}[op]
        return f"CASE WHEN {a} {sym} {b} THEN 1.0 ELSE 0.0 END"
    if op == "fadd":
        return f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL ELSE {a} + {b} END"
    if op == "fsub":
        return f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL ELSE {a} - {b} END"
    if op == "fmul":
        return f"{a} * {b}"
    if op == "fdiv":
        # raw IEEE: x/0 = ±Infinity by sign of x, 0/0 = NaN (NULL encoding)
        return (
            f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL "
            f"WHEN {b} = 0 AND {a} > 0 THEN CAST('Infinity' AS DOUBLE) "
            f"WHEN {b} = 0 AND {a} < 0 THEN CAST('-Infinity' AS DOUBLE) "
            f"WHEN {b} = 0 THEN NULL ELSE {a} / {b} END"
        )
    if op == "and":
        ta = f"({a} IS NOT NULL AND abs({a}) >= 1e-12)"
        tb = f"({b} IS NOT NULL AND abs({b}) >= 1e-12)"
        return f"CASE WHEN {ta} AND {tb} THEN 1.0 ELSE 0.0 END"
    if op == "or":
        ta = f"({a} IS NOT NULL AND abs({a}) >= 1e-12)"
        tb = f"({b} IS NOT NULL AND abs({b}) >= 1e-12)"
        return f"CASE WHEN {ta} OR {tb} THEN 1.0 ELSE 0.0 END"
    raise ValueError(op)


def _time_sql(mode: str) -> str:
    ts = "to_timestamp(t)"
    table = {
        "secondOfMinute": "t % 60",
        "secondOfDay": "t % 86400",
        "minuteOfHour": "floor((t % 3600) / 60)",
        "minuteOfDay": "floor((t % 86400) / 60)",
        "hourOfDay": "floor((t % 86400) / 3600)",
        "dayOfWeek": f"isodow({ts})",  # ISO Monday=1..Sunday=7
        "dayOfMonth": f"day({ts})",
        "dayOfYear": f"dayofyear({ts})",
        "monthOfYear": f"month({ts})",
        "yearOfCentury": f"year({ts}) % 100",
        "yearOfEra": f"year({ts})",
        "seconds": "t",
        "minutes": "t / 60",
        "hours": "t / 3600",
        "days": "t / 86400",
        "weeks": "t / 604800",
        # ChronoField.valueOf fallthrough names (MathExpr.scala:197)
        "HOUR_OF_DAY": "floor((t % 86400) / 3600)",
        "MINUTE_OF_HOUR": "floor((t % 3600) / 60)",
        "MINUTE_OF_DAY": "floor((t % 86400) / 60)",
        "SECOND_OF_MINUTE": "t % 60",
        "SECOND_OF_DAY": "t % 86400",
        "CLOCK_HOUR_OF_DAY": "(floor((t % 86400) / 3600) + 23) % 24 + 1",
        "AMPM_OF_DAY": "floor((t % 86400) / 43200)",
        "DAY_OF_WEEK": f"isodow({ts})",
        "DAY_OF_MONTH": f"day({ts})",
        "DAY_OF_YEAR": f"dayofyear({ts})",
        "EPOCH_DAY": "floor(t / 86400)",
        "MONTH_OF_YEAR": f"month({ts})",
        "YEAR": f"year({ts})",
        "INSTANT_SECONDS": "t",
    }
    if mode not in table:
        raise ValueError(f":time mode {mode} has no SQL oracle")
    return table[mode]
