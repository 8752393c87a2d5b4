"""Gremlin-lite traversal layer — the reference's interactive-engine
step surface (GIE, docs/interactive_engine.rst:184-369) re-expressed as
lazy DataFrame compilation over LinkGraph.

The reference compiles Gremlin to a distributed dataflow
(interactive_engine/, Java/Rust); here every step is a DataFrame
transformation, so the *whole traversal* compiles to ONE Catalyst plan
— filters push into the scan, hops become shuffle joins on the vertex
key, aggregations get map-side partial combine, and AQE handles skewed
hub vertices. Nothing materializes until a terminal (toDF/toList/n).

Supported steps (GIE inventory → here):

- source:     V(*ids), E()                            rst:188-196
- flatMap:    out/in_/both(label), outE/inE, inV/outV/otherV/bothV
- filter:     has(key, P.*/value), hasId, is_, where(__...),
              not_(__...), dedup, limit, range_, simplePath
- map:        values(key), valueMap(*keys), id_(), constant,
              select(tags), select(keys|values), path(), unfold,
              properties(*keys).key()/.value()        rst:270-277
- aggregate:  count, sum_, min_, max_, mean, fold, groupCount,
              group().by(key).by(value)                rst:320-330
- branch:     branch(key).option(value, __...)         rst:296-318
- local scope (Gremlin `count(local)` etc., rst:270-295, over folded
  arrays): count_local, dedup_local, order_local, range_local,
              sum_local, min_local, max_local, mean_local
- modulation: as_(tag), order(by),
              repeat(__...).times(k).emit(),
              repeat(__...).until(__cond).emit()       rst:340-358
- side effects: aggregate(key)/cap(key); subgraph(key)/cap(key) — the
  GIE docs' simplified Subgraph (rst:365), extracted to a LinkGraph
- standard-Gremlin extras beyond the GIE-documented subset:
  union(__a, __b), coalesce(__a, __b), optional(__sub),
  choose(__cond, __t[, __f]), project(*tags).by(mod)...,
  hasNot(key), hasLabel(*labels), cyclicPath, identity,
  tail(n), sample(n) (deterministic hash draw)
- sack:       g.with_sack(init) ... sack(op).by(prop), sack()
              (sack rides the traverser row as a carried column; each
              update is a codegen projection — the chain stays 1 plan)
- side effect: aggregate(key) ... cap(key) (retrieve-at-end form;
              mid-stream side-effect reads unsupported)
- predicates: P.gt/gte/lt/lte/eq/neq/within/without/between,
              Text.startingWith/containing/regex

Deliberately absent (as in GIE, rst:359-369): match/profile,
nested repeat. until() is the post-condition form
(repeat(sub).until(cond)); each round is checkpoint-cut like a
SuperstepRunner superstep, with a max_rounds guard because a
distributed loop with a never-true condition must terminate.

Deviation: Gremlin enables path() retroactively; a single-pass
DataFrame plan cannot reconstruct history, so path tracking is opted
in at the source (`g.with_path().V()`), and paths record vertex ids.

Scale notes: a k-hop traversal is k shuffle joins of E on the vertex
key — the same fabric as one superstep of the algorithm layer, so the
same properties hold (map-side combine on aggregations, broadcast of
small filtered sides by AQE, skew-join splitting for hubs). Correlated
`where(__...)` compiles to a seeded sub-plan + semi-join, never a
driver loop.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import DST, ID, SRC, LinkGraph

__all__ = ["P", "Text", "__", "traversal", "Traversal"]


class P:
    """Gremlin predicates → Column-expression factories."""

    @staticmethod
    def gt(v):    return lambda c: c > v
    @staticmethod
    def gte(v):   return lambda c: c >= v
    @staticmethod
    def lt(v):    return lambda c: c < v
    @staticmethod
    def lte(v):   return lambda c: c <= v
    @staticmethod
    def eq(v):    return lambda c: c == v
    @staticmethod
    def neq(v):   return lambda c: c != v
    @staticmethod
    def within(*vals):  return lambda c: c.isin(list(vals))
    @staticmethod
    def without(*vals): return lambda c: ~c.isin(list(vals))
    @staticmethod
    def between(lo, hi): return lambda c: (c >= lo) & (c < hi)
    @staticmethod
    def not_(p):  return lambda c: ~p(c)


class Text:
    @staticmethod
    def startingWith(s): return lambda c: c.startswith(s)
    @staticmethod
    def endingWith(s):   return lambda c: c.endswith(s)
    @staticmethod
    def containing(s):   return lambda c: c.contains(s)
    @staticmethod
    def regex(pat):      return lambda c: c.rlike(pat)


def _as_pred(v) -> Callable[[Column], Column]:
    return v if callable(v) else (lambda c: c == F.lit(v))


class _Anon:
    """Anonymous sub-traversal recorder (Gremlin's `__`): records a
    step chain, replayed by where/not_/repeat against a seeded state."""

    def __init__(self, steps=()):
        self._steps = list(steps)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)

        def record(*args, **kw):
            return _Anon(self._steps + [(name, args, kw)])

        return record

    def _apply(self, trav: "Traversal") -> "Traversal":
        for name, args, kw in self._steps:
            trav = getattr(trav, name)(*args, **kw)
        return trav


class _AnonFactory:
    def __getattr__(self, name):
        return getattr(_Anon(), name)


__ = _AnonFactory()

_SEED, _PATH, _SACK = "__seed", "__path", "__sack"

# sack(op) operators (Gremlin Operator enum subset). Column-expression
# only, so a sack update stays inside the step's codegen projection.
_SACK_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "sum": lambda s, v: s + v,
    "minus": lambda s, v: s - v,
    "mult": lambda s, v: s * v,
    "div": lambda s, v: s / v,
    "min": F.least,
    "max": F.greatest,
    "assign": lambda s, v: v,
}

# Kind → the columns that identify a traverser of that kind, and the
# default deterministic order used by paging steps when no explicit
# order() was applied. Shared by dedup/union/choose/sample/range_/tail
# so the per-kind column sets cannot drift apart.
_KIND_COLS: dict[str, list[str]] = {
    "v": ["e"], "e": ["esrc", "edst"], "value": ["val"], "pairs": ["key"],
}
_DEFAULT_ORDER: dict[str, tuple] = {
    "v": (("e", False),),
    "e": (("esrc", False), ("edst", False)),
    "value": (("val", False),),
    "pairs": (("key", False),),
}


def _vprops(graph: LinkGraph, cols: dict[str, str]) -> DataFrame:
    """One row per vertex id with the requested property columns
    (source column → output alias). Element identity in this layer is
    the id, but multi-label vertex tables store one ROW per (id,
    label) — a raw join would multiply traversers, so duplicate rows
    resolve deterministically to the min non-null value per column."""
    return graph.vertices.groupBy(F.col(ID).alias("e")).agg(
        *[F.min(src).alias(dst) for src, dst in cols.items()])


def _eprops(graph: LinkGraph, cols: dict[str, str]) -> DataFrame:
    """One row per (src, dst) with the requested edge property columns.
    Edge identity in this layer is the endpoint pair; parallel edges
    (same endpoints, different rows) resolve deterministically to the
    min non-null value per column rather than multiplying traversers."""
    return graph.edges.groupBy(
        F.col(SRC).alias("esrc"), F.col(DST).alias("edst")).agg(
        *[F.min(src).alias(dst) for src, dst in cols.items()])


class Traversal:
    """Immutable traversal state: a DataFrame plus what its rows mean
    (kind 'v' → column e; 'e' → esrc/edst[/eprev]; 'value' → val;
    'pairs' → key/cnt)."""

    def __init__(self, graph: LinkGraph, df: DataFrame, kind: str,
                 order_cols: tuple = (), seed_df: DataFrame | None = None,
                 track_path: bool = False,
                 sides: dict[str, DataFrame] | None = None):
        self.graph = graph
        self.df = df
        self.kind = kind
        self._order = order_cols
        self._seed_df = seed_df      # universe of seeds inside where()
        self._track_path = track_path
        self._sides = sides or {}    # aggregate(key) side-effect streams

    def _next(self, df: DataFrame, kind: str | None = None,
              order: tuple | None = None) -> "Traversal":
        return Traversal(self.graph, df, kind or self.kind,
                         self._order if order is None else order,
                         self._seed_df, self._track_path, self._sides)

    def _rebuilt(self, df: DataFrame, kind: str) -> "Traversal":
        """Successor for branch-combining steps (union/coalesce/
        optional/choose) whose output may not retain every carry
        column: path tracking stays on only if __path survived, so a
        later path-dependent step either works or raises the clear
        'start with g.with_path()' error instead of an unresolved-
        column AnalysisException."""
        return Traversal(self.graph, df, kind, (), self._seed_df,
                         self._track_path and _PATH in df.columns,
                         self._sides)

    def _carry(self) -> list[str]:
        """Columns carried across steps (seed, path, tags)."""
        keep = [c for c in self.df.columns
                if c.startswith("t_") or c in (_SEED, _SACK)]
        if self._track_path and _PATH in self.df.columns:
            keep.append(_PATH)
        return keep

    def _need(self, kind: str, step: str) -> None:
        if self.kind != kind:
            raise TypeError(f"{step}() needs a {kind!r}-kind traversal, "
                            f"have {self.kind!r}")

    # -- flatMap: hops ---------------------------------------------------
    def _edges(self, label: str | None) -> DataFrame:
        e = self.graph.edges
        if label is not None:
            if "label" not in e.columns:
                raise KeyError("graph has no edge labels")
            e = e.where(F.col("label") == label)
        return e.select(SRC, DST)

    def _hop(self, label: str | None, reverse: bool) -> DataFrame:
        self._need("v", "in_" if reverse else "out")
        e = self._edges(label)
        on, to = (DST, SRC) if reverse else (SRC, DST)
        cols = [F.col(to).alias("e")] + [F.col(c) for c in self._carry()
                                         if c != _PATH]
        if self._track_path:
            cols.append(F.concat(_PATH, F.array(F.col(to))).alias(_PATH))
        return self.df.join(e, self.df["e"] == e[on]).select(*cols)

    def out(self, label: str | None = None) -> "Traversal":
        return self._next(self._hop(label, reverse=False))

    def in_(self, label: str | None = None) -> "Traversal":
        return self._next(self._hop(label, reverse=True))

    def both(self, label: str | None = None) -> "Traversal":
        return self._next(self._hop(label, False).unionByName(self._hop(label, True)))

    def outE(self, label: str | None = None) -> "Traversal":
        self._need("v", "outE")
        e = self._edges(label)
        df = self.df.join(e, self.df["e"] == e[SRC]).select(
            F.col(SRC).alias("esrc"), F.col(DST).alias("edst"),
            F.col("e").alias("eprev"), *[F.col(c) for c in self._carry()])
        return self._next(df, "e")

    def inE(self, label: str | None = None) -> "Traversal":
        self._need("v", "inE")
        e = self._edges(label)
        df = self.df.join(e, self.df["e"] == e[DST]).select(
            F.col(SRC).alias("esrc"), F.col(DST).alias("edst"),
            F.col("e").alias("eprev"), *[F.col(c) for c in self._carry()])
        return self._next(df, "e")

    def _to_v(self, col: Column) -> "Traversal":
        cols = [col.alias("e")] + [F.col(c) for c in self._carry() if c != _PATH]
        if self._track_path:
            cols.append(F.concat(_PATH, F.array(col)).alias(_PATH))
        return self._next(self.df.select(*cols), "v")

    def inV(self) -> "Traversal":
        self._need("e", "inV")
        return self._to_v(F.col("edst"))

    def outV(self) -> "Traversal":
        self._need("e", "outV")
        return self._to_v(F.col("esrc"))

    def otherV(self) -> "Traversal":
        self._need("e", "otherV")
        return self._to_v(F.when(F.col("eprev") == F.col("esrc"),
                                 F.col("edst")).otherwise(F.col("esrc")))

    def bothV(self) -> "Traversal":
        """Both endpoints of each edge (GIE `g.V().inE().bothV()`,
        rst:296-305): one vertex traverser per endpoint — a two-arm
        union, still one Catalyst plan."""
        self._need("e", "bothV")
        return self._next(self._to_v(F.col("esrc")).df.unionByName(
            self._to_v(F.col("edst")).df), "v")

    # -- filters ---------------------------------------------------------
    def hasId(self, *ids) -> "Traversal":
        self._need("v", "hasId")
        return self._next(self.df.where(F.col("e").isin([int(i) for i in ids])))

    def has(self, key: str, value=None) -> "Traversal":
        """has('key') existence / has('key', value) / has('key', P.xx).

        Filter semantics: a traverser passes iff ANY vertex row for its
        element matches — a left-semi join against the matching ids, so
        multi-label vertex tables (one row per (id, label), graph.py
        add_labels) never multiply traversers."""
        self._need("v", "has")
        v = self.graph.vertices
        if key not in v.columns:
            raise KeyError(f"vertex column {key!r} not found")
        p = F.col(key)
        cond = p.isNotNull() if value is None else _as_pred(value)(p)
        ok = v.where(cond).select(F.col(ID).alias("e"))
        return self._next(self.df.join(ok, "e", "left_semi"))

    def is_(self, value) -> "Traversal":
        self._need("value", "is_")
        return self._next(self.df.where(_as_pred(value)(F.col("val"))))

    def dedup(self) -> "Traversal":
        return self._next(self.df.dropDuplicates(_KIND_COLS[self.kind]))

    def _seeded(self, sub: _Anon) -> "Traversal":
        seeds = self.df.withColumn(_SEED, F.col({"v": "e", "value": "val"}[self.kind]))
        inner = Traversal(self.graph, seeds, self.kind,
                          seed_df=seeds.select(_SEED).distinct(),
                          track_path=False)
        return sub._apply(inner)

    def match(self, *patterns: "_Anon") -> "Traversal":
        """Gremlin match() as pattern sugar over the existing
        as_/where/select machinery (BEYOND GIE parity — GIE lists
        Match unsupported, rst:359-369; shipped in the same spirit as
        sack/subgraph).

        Each pattern must begin with __.as_(start); a trailing
        as_(end) binds the endpoint on first occurrence or must AGREE
        with the existing binding (join semantics). Patterns run in
        the given order — order them so every pattern after the first
        starts from an already-bound tag. A pattern without a trailing
        as_ is a pure constraint on its start binding.

        Compilation: bindings are carried t_ columns; repositioning at
        a bound tag is a projection; endpoint agreement is a codegen
        equality filter — so the whole match stays ONE Catalyst plan
        (k hop-patterns = k shuffle joins, never a driver loop). The
        result is positioned at the last pattern's endpoint with all
        bindings retained; chain .select(tags...) to read them out.
        """
        self._need("v", "match")
        if not patterns:
            raise TypeError("match() needs at least one pattern")
        cur = self
        for i, sub in enumerate(patterns):
            steps = list(getattr(sub, "_steps", ()))
            if not steps or steps[0][0] != "as_":
                raise TypeError(
                    "each match() pattern must start with __.as_(tag)")
            start = steps[0][1][0]
            end = None
            if len(steps) > 1 and steps[-1][0] == "as_":
                end = steps[-1][1][0]
                mid = steps[1:-1]
            else:
                mid = steps[1:]
            scol = f"t_{start}"
            if scol not in cur.df.columns:
                if i > 0:
                    raise TypeError(
                        f"match() pattern {i}: start tag {start!r} is "
                        "unbound — order patterns so each starts from a "
                        "bound tag")
                cur = cur.as_(start)
            else:
                cols = [F.col(scol).alias("e")] + [
                    F.col(c) for c in cur.df.columns if c != "e"]
                cur = cur._next(cur.df.select(*cols))
            cur = _Anon(mid)._apply(cur)
            if cur.kind != "v":
                raise TypeError(
                    f"match() pattern {i}: patterns must stay vertex-kind "
                    f"(got {cur.kind!r}); aggregate/value steps belong in "
                    "where(), not match()")
            if end is not None:
                ecol = f"t_{end}"
                if ecol in cur.df.columns:
                    cur = cur._next(cur.df.where(F.col("e") == F.col(ecol)))
                else:
                    cur = cur.as_(end)
        return cur

    def where(self, sub: "_Anon") -> "Traversal":
        """Correlated filter: keep elements whose sub-traversal is
        non-empty (GIE `where(out().count().is(gt(4)))`,
        rst:206-214) — a seeded sub-plan + left-semi join, fully
        distributed."""
        self._need("v", "where")
        hit = self._seeded(sub).df.select(_SEED).distinct()
        return self._next(
            self.df.join(hit, self.df["e"] == hit[_SEED], "left_semi"))

    # -- standard-Gremlin extras beyond the GIE-documented subset -----
    def union(self, *subs: "_Anon") -> "Traversal":
        """Gremlin union(__a, __b, ...): run every sub-traversal from
        each current element and concatenate the streams (duplicates
        preserved) — one N-arm unionByName, still ONE Catalyst plan.
        Arms must produce the same traverser kind. Sack/tag carries
        survive when every arm retained them; path does not (arms run
        unseeded from path tracking), and the result reflects that
        honestly — path tracking is off downstream."""
        self._need("v", "union")
        if not subs:
            raise TypeError("union() needs at least one sub-traversal")
        outs = [self._seeded(sub) for sub in subs]
        kinds = {t.kind for t in outs}
        if len(kinds) != 1:
            raise TypeError(f"union(): arms produce mixed kinds {sorted(kinds)}")
        kind = kinds.pop()
        # sack/tag carries flow through the seeded arms; keep the ones
        # every arm retained (path never survives: arms are seeded
        # without tracking — _rebuilt turns tracking off)
        carry = [c for c in outs[0].df.columns
                 if (c.startswith("t_") or c == _SACK)
                 and all(c in t.df.columns for t in outs[1:])]
        cols = _KIND_COLS[kind] + carry
        df = outs[0].df.select(*cols)
        for t in outs[1:]:
            df = df.unionByName(t.df.select(*cols))
        return self._rebuilt(df, kind)

    def coalesce(self, *subs: "_Anon") -> "Traversal":
        """Gremlin coalesce(__a, __b, ...): per element, emit the FIRST
        sub-traversal that produces any result. Distributed form: all
        arms run seeded in one plan, min(arm index) per seed picks the
        winning arm, an equi-join re-emits only its rows. Arms must
        produce vertices or values (one output column)."""
        self._need("v", "coalesce")
        if not subs:
            raise TypeError("coalesce() needs at least one sub-traversal")
        outs = [self._seeded(sub) for sub in subs]
        kinds = {t.kind for t in outs}
        if len(kinds) != 1:
            raise TypeError(
                f"coalesce(): arms produce mixed kinds {sorted(kinds)}")
        kind = kinds.pop()
        if kind not in ("v", "value"):
            raise TypeError("coalesce(): arms must produce vertices or values")
        col = {"v": "e", "value": "val"}[kind]
        carry = [c for c in outs[0].df.columns
                 if (c.startswith("t_") or c == _SACK)
                 and all(c in t.df.columns for t in outs[1:])]
        arms = [t.df.select(_SEED, *carry, F.col(col).alias("__x"),
                            F.lit(i).alias("__arm"))
                for i, t in enumerate(outs)]
        allr = arms[0]
        for a in arms[1:]:
            allr = allr.unionByName(a)
        winner = allr.groupBy(_SEED).agg(F.min("__arm").alias("__arm"))
        picked = allr.join(winner, [_SEED, "__arm"]).select(
            F.col("__x").alias(col), *carry)
        return self._rebuilt(picked, kind)

    def optional(self, sub: "_Anon") -> "Traversal":
        """Gremlin optional(__sub): the sub-traversal's results where
        it produced any, the incoming element itself where it did not
        — sub-plan + anti-join passthrough, one plan."""
        self._need("v", "optional")
        t = self._seeded(sub)
        if t.kind != "v":
            raise TypeError("optional(): sub-traversal must produce vertices")
        hit = t.df.select(_SEED).distinct()
        carry = [c for c in t.df.columns
                 if (c.startswith("t_") or c == _SACK)
                 and c in self.df.columns]
        misses = self.df.join(hit, self.df["e"] == hit[_SEED],
                              "left_anti").select("e", *carry)
        return self._rebuilt(
            t.df.select("e", *carry).unionByName(misses), "v")

    def choose(self, cond: "_Anon", true_sub: "_Anon",
               false_sub: "_Anon | None" = None) -> "Traversal":
        """Gremlin choose(cond, t, f): per element, continue with the
        t arm where the cond sub-traversal produced any result, the f
        arm (or the element unchanged) where it did not. The split is
        a semi/anti-join pair on the seeded cond sub-plan and both
        arms stay in the same Catalyst plan — no driver branching.
        Arms must end in the same traverser kind."""
        self._need("v", "choose")
        hit = self._seeded(cond).df.select(_SEED).distinct()
        t_in = self._next(
            self.df.join(hit, self.df["e"] == hit[_SEED], "left_semi"))
        f_in = self._next(
            self.df.join(hit, self.df["e"] == hit[_SEED], "left_anti"))
        t_out = true_sub._apply(t_in)
        f_out = false_sub._apply(f_in) if false_sub is not None else f_in
        kinds = {t_out.kind, f_out.kind}
        if len(kinds) != 1:
            raise TypeError(f"choose(): arms produce mixed kinds {sorted(kinds)}")
        kind = kinds.pop()
        # keep every carry column (seed/path/sack/tags) that survived
        # BOTH arms — the arms run on semi/anti splits of self.df, so
        # carries flow through them; only arm-divergent ones drop
        carry = [c for c in t_out.df.columns
                 if (c.startswith("t_") or c in (_SEED, _SACK, _PATH))
                 and c in f_out.df.columns]
        cols = _KIND_COLS[kind] + carry
        return self._rebuilt(
            t_out.df.select(*cols).unionByName(f_out.df.select(*cols)),
            kind)

    def not_(self, sub: "_Anon") -> "Traversal":
        self._need("v", "not_")
        hit = self._seeded(sub).df.select(_SEED).distinct()
        return self._next(
            self.df.join(hit, self.df["e"] == hit[_SEED], "left_anti"))

    def hasNot(self, key: str) -> "Traversal":
        """Gremlin hasNot('key'): keep vertices whose property is
        absent (null) — the complement of has('key'). Anti-join
        against the ids with a non-null value, so a multi-row vertex
        (multi-label) passes iff NO row has the property."""
        self._need("v", "hasNot")
        v = self.graph.vertices
        if key not in v.columns:
            return self._next(self.df)  # nobody has it: all pass
        present = v.where(F.col(key).isNotNull()).select(F.col(ID).alias("e"))
        return self._next(self.df.join(present, "e", "left_anti"))

    def hasLabel(self, *labels: str) -> "Traversal":
        """Gremlin hasLabel(l1, l2, ...): filter vertices/edges by
        label (vertex labels from the multi-label `label` column —
        graph.py add_labels; edge labels from the edge table). A
        semi-join against the matching label rows — never multiplies
        traversers, even when an element has several matching labels.
        The vertex form is exactly has('label', P.within(...))."""
        if not labels:
            raise TypeError("hasLabel() needs at least one label")
        if self.kind == "v":
            if "label" not in self.graph.vertices.columns:
                raise KeyError("graph has no vertex labels")
            return self.has("label", P.within(*labels))
        if self.kind == "e":
            if "label" not in self.graph.edges.columns:
                raise KeyError("graph has no edge labels")
            lab = (self.graph.edges
                   .where(F.col("label").isin(list(labels)))
                   .select(F.col(SRC).alias("esrc"), F.col(DST).alias("edst")))
            return self._next(self.df.join(lab, ["esrc", "edst"], "left_semi"))
        raise TypeError("hasLabel(): needs a vertex or edge traverser")

    def filter_(self, sub: "_Anon") -> "Traversal":
        """GIE `filter(values("age").is(gt(20)))` (rst:204-205) —
        same correlated-semi-join semantics as where()."""
        return self.where(sub)

    def simplePath(self) -> "Traversal":
        if not self._track_path:
            raise TypeError("simplePath() needs g.with_path()")
        return self._next(self.df.where(
            F.size(F.array_distinct(_PATH)) == F.size(F.col(_PATH))))

    def cyclicPath(self) -> "Traversal":
        """Complement of simplePath(): keep traversers whose path
        revisits a vertex."""
        if not self._track_path:
            raise TypeError("cyclicPath() needs g.with_path()")
        return self._next(self.df.where(
            F.size(F.array_distinct(_PATH)) < F.size(F.col(_PATH))))

    def identity(self) -> "Traversal":
        """Gremlin identity(): the traverser unchanged (useful as a
        choose()/union() arm)."""
        return self._next(self.df)

    # -- map -------------------------------------------------------------
    def values(self, key: str) -> "Traversal":
        self._need("v", "values")
        v = self.graph.vertices
        if key not in v.columns:
            raise KeyError(f"vertex column {key!r} not found")
        props = _vprops(self.graph, {key: "val"})
        return self._next(
            self.df.join(props, "e").select("val", *self._carry()), "value")

    def id_(self) -> "Traversal":
        self._need("v", "id_")
        return self._next(self.df.select(F.col("e").alias("val"),
                                         *self._carry()), "value")

    def label(self) -> "Traversal":
        """GIE `g.V().label()` / `g.E().label()` (rst:263-266): the
        element's label as a value traverser. Vertex labels come from
        a `label` column on the vertex table (multi-label graphs —
        graph.py add_labels); edge labels from the edge table."""
        if self.kind == "v":
            v = self.graph.vertices
            if "label" not in v.columns:
                raise KeyError("graph has no vertex labels")
            props = _vprops(self.graph, {"label": "val"})
            return self._next(
                self.df.join(props, "e").select("val", *self._carry()),
                "value")
        if self.kind == "e":
            if "label" not in self.graph.edges.columns:
                raise KeyError("graph has no edge labels")
            lab = _eprops(self.graph, {"label": "val"})
            return self._next(
                self.df.join(lab, ["esrc", "edst"]).select(
                    "val", *self._carry()), "value")
        raise TypeError("label(): needs a vertex or edge traverser")

    def valueMap(self, *keys: str) -> "Traversal":
        """Per-element property map (GIE valueMap, rst:296-318),
        flattened to one row per element with one column per property
        (our properties are single-valued, so Gremlin's
        Map<key, List<v>> collapses to columns). No keys → all vertex
        property columns."""
        self._need("v", "valueMap")
        v = self.graph.vertices
        ks = list(keys) or [c for c in v.columns if c != ID]
        missing = [k for k in ks if k not in v.columns]
        if missing:
            raise KeyError(f"vertex columns not found: {missing}")
        props = _vprops(self.graph, {k: k for k in ks})
        return self._next(
            self.df.join(props, "e").select(F.col("e").alias(ID), *ks),
            "pairs")

    def properties(self, *keys: str) -> "Traversal":
        """One property traverser per (element, key) (GIE
        `g.V().properties('name').key()/.value()`, rst:270-277).
        Columns: e / pkey / pval; pval is cast to string when the call
        spans >1 property column so the per-key union arms share one
        type (Gremlin property values are heterogeneous) — a
        single-key call keeps the native type. No keys → all vertex
        property columns. Follow with key() or value()."""
        self._need("v", "properties")
        v = self.graph.vertices
        ks = list(keys) or [c for c in v.columns if c != ID]
        missing = [k for k in ks if k not in v.columns]
        if missing:
            raise KeyError(f"vertex columns not found: {missing}")
        cast = len(ks) > 1
        joined = self.df.join(_vprops(self.graph, {k: k for k in ks}), "e")
        carry = self._carry()
        arms = [joined.select(
                    "e", F.lit(k).alias("pkey"),
                    (F.col(k).cast("string") if cast else F.col(k))
                    .alias("pval"), *carry)
                for k in ks]
        df = arms[0]
        for a in arms[1:]:
            df = df.unionByName(a)
        return self._next(df, "prop")

    def key(self) -> "Traversal":
        """Property name of each property traverser (GIE
        `.properties('name').key()`, rst:272-273)."""
        self._need("prop", "key")
        return self._next(self.df.select(F.col("pkey").alias("val"),
                                         *self._carry()), "value")

    def value(self) -> "Traversal":
        """Property value of each property traverser (GIE
        `.properties('name').value()`, rst:275-277)."""
        self._need("prop", "value")
        return self._next(self.df.select(F.col("pval").alias("val"),
                                         *self._carry()), "value")

    def unfold(self) -> "Traversal":
        """Explode a folded array value back into elements (GIE
        unfold, rst:296-318)."""
        self._need("value", "unfold")
        return self._next(
            self.df.select(F.explode("val").alias("val"), *self._carry()),
            "value")

    def constant(self, v) -> "Traversal":
        return self._next(self.df.select(F.lit(v).alias("val"),
                                         *self._carry()), "value")

    # -- sack (Gremlin withSack/sack, previously declared absent) -------
    def sack(self, op: str | Callable | None = None):
        """No arg: map each traverser to its sack value (value
        traverser; the sack itself stays carried). With an operator
        ('sum'/'minus'/'mult'/'div'/'min'/'max'/'assign' or a
        two-Column callable): returns a modulator — `.by(key)` reads
        the current element's property (edge property on an
        edge traverser, vertex property on a vertex traverser, the
        value itself on a value traverser with key=None) and folds it
        into the sack. Each update is one codegen projection (plus the
        property join the step would need anyway); the sack rides the
        traverser row like a tag, so the whole chain stays ONE plan."""
        if _SACK not in self.df.columns:
            raise TypeError("sack(): start the traversal with "
                            "g.with_sack(init)")
        if op is None:
            return self._next(
                self.df.select(F.col(_SACK).alias("val"), *self._carry()),
                "value")
        fn = _SACK_OPS[op] if isinstance(op, str) else op
        return _Sack(self, fn)

    # -- side effects (Gremlin aggregate/cap) ---------------------------
    def aggregate(self, key: str) -> "Traversal":
        """Collect the current elements into side-effect ``key`` and
        continue unchanged. Lazy where Gremlin's barrier is eager: the
        collected stream is a DataFrame branch materialized only if a
        later cap(key) is reached — fine for the retrieve-at-the-end
        use; mid-stream reads of a side effect (within('x')) are not
        supported."""
        if self.kind == "e":
            # an edge traverser aggregates the EDGE (both endpoints),
            # folded as (src, dst) structs — not just its source id
            x = F.struct(F.col("esrc").alias("src"),
                         F.col("edst").alias("dst"))
        else:
            x = F.col({"v": "e", "value": "val"}[self.kind])
        t = self._next(self.df)
        t._sides = {**self._sides,
                    key: ("fold", self.df.select(x.alias("x")))}
        return t

    def subgraph(self, key: str) -> "Traversal":
        """Side-effect subgraph extraction — the GIE docs' "simplified
        version ... to extract subgraphs" (rst:365; GIE writes the
        subgraph to Vineyard, here the target is a LinkGraph). Valid on
        edge traversers; the traversed edge stream is collected lazily,
        the traversal continues unchanged, and a terminal cap(key)
        yields the LinkGraph (Gremlin's `subgraph('sg').cap('sg')`)."""
        self._need("e", "subgraph")
        t = self._next(self.df)
        t._sides = {**self._sides,
                    key: ("graph",
                          self.df.select(F.col("esrc").alias(SRC),
                                         F.col("edst").alias(DST)))}
        return t

    def cap(self, key: str):
        """Barrier: discard the traverser stream and emit side-effect
        ``key`` — a value traverser holding the sorted fold of the
        collected elements for an aggregate(key), or the extracted
        LinkGraph for a subgraph(key)."""
        if key not in self._sides:
            raise KeyError(f"cap({key!r}): no aggregate({key!r}) / "
                           f"subgraph({key!r}) upstream")
        kind, side = self._sides[key]
        if kind == "graph":
            # vertex set induced from the traversed edge endpoints (the
            # reference's `_` label deduction, framework/graph.py:417-563)
            return LinkGraph.from_edges(
                side.distinct(),
                directed=bool(getattr(self.graph, "directed", True)))
        df = side.agg(F.array_sort(F.collect_list("x")).alias("val"))
        return self._next(df, "value", order=())

    def as_(self, tag: str) -> "Traversal":
        self._need("v", "as_")
        return self._next(self.df.withColumn(f"t_{tag}", F.col("e")))

    def select(self, *tags: str) -> "Traversal":
        if (self.kind == "pairs" and len(tags) == 1
                and tags[0] in ("keys", "values")
                and {"key", "val"} <= set(self.df.columns)):
            # Gremlin Column.keys / Column.values over a group() result
            # (GIE `group().by().by(values('name')).select(values)
            # .unfold()`, rst:310-311)
            col = "key" if tags[0] == "keys" else "val"
            return self._next(self.df.select(F.col(col).alias("val")),
                              "value")
        cols = [F.col(f"t_{t}").alias(t) for t in tags]
        return self._next(self.df.select(*cols), "pairs")

    def path(self) -> "Traversal":
        if not self._track_path:
            raise TypeError("path() needs g.with_path()")
        return self._next(self.df.select(F.col(_PATH).alias("val")), "value")

    # -- aggregation (seeded-aware: inside where() aggregates group by
    #    seed and absent seeds count as 0 — Gremlin's empty-traversal
    #    count) ------------------------------------------------------
    def _agg(self, expr: Column, zero=None) -> "Traversal":
        if _SEED in self.df.columns and self._seed_df is not None:
            per = self.df.groupBy(_SEED).agg(expr.alias("val"))
            df = self._seed_df.join(per, _SEED, "left")
            if zero is not None:
                df = df.select(_SEED, F.coalesce("val", F.lit(zero)).alias("val"))
            else:
                df = df.where(F.col("val").isNotNull())
            return Traversal(self.graph, df, "value",
                             seed_df=self._seed_df, track_path=False)
        return self._next(self.df.agg(expr.alias("val")), "value")

    def count(self) -> "Traversal":
        col = {"v": "e", "e": "esrc", "value": "val", "prop": "pval"}[self.kind]
        return self._agg(F.count(col), zero=0)

    def sum_(self) -> "Traversal":
        self._need("value", "sum_")
        return self._agg(F.sum("val"))

    def min_(self) -> "Traversal":
        self._need("value", "min_")
        return self._agg(F.min("val"))

    def max_(self) -> "Traversal":
        self._need("value", "max_")
        return self._agg(F.max("val"))

    def mean(self) -> "Traversal":
        self._need("value", "mean")
        return self._agg(F.avg("val"))

    def fold(self) -> "Traversal":
        col = {"v": "e", "value": "val"}[self.kind]
        return self._agg(F.sort_array(F.collect_list(col)))

    def groupCount(self, by: str | None = None) -> "Traversal":
        """(key, cnt) per distinct current element — GIE groupCount.
        `by` groups by a vertex property instead of the element
        (groupCount().by('prop') ≡ group().by('prop').by(count))."""
        if by is not None:
            t = self.group().by(by).by(__.count())._built()
            return t._next(
                t.df.select("key", F.col("val").cast("long").alias("cnt")),
                "pairs")
        col = {"v": "e", "value": "val"}[self.kind]
        df = self.df.groupBy(F.col(col).alias("key")).agg(
            F.count("*").alias("cnt"))
        return self._next(df, "pairs")

    def group(self) -> "_Group":
        """group().by(key).by(value) (GIE group, rst:320-330).

        First by(): key selector — None/omitted = the element itself,
        or a vertex property name. Second by(): the per-key value —
        None = sorted fold of the elements, a property name = sorted
        fold of that property, or an anonymous sub-traversal whose
        LAST step is an aggregate (count/sum_/min_/max_/mean/fold);
        the reduction then runs over the concatenated per-key stream,
        Gremlin's semantics. Compiles to prefix-sub-plan + one
        hash-aggregate on the key — one Catalyst plan, no driver loop.
        """
        self._need("v", "group")
        return _Group(self)

    def project(self, *tags: str) -> "_Project":
        """project('a','b').by(mod).by(mod): one output row per
        incoming element with a named column per tag. A by()
        modulator is a vertex property name or a __ sub-traversal
        ending in an aggregate (count/sum_/min_/max_/mean/fold),
        reduced per element; tags beyond the supplied modulators
        default to the element id. Compiles to one property join /
        seeded sub-plan per tag joined back on the element — ONE
        Catalyst plan, no driver loop."""
        self._need("v", "project")
        return _Project(self, tags)

    # -- local scope (Gremlin `step(local)`, rst:270-295): operate
    #    INSIDE each folded array value — pure codegen array
    #    expressions, zero shuffle -------------------------------------
    def _local(self, step: str, fn) -> "Traversal":
        self._need("value", step)
        return self._next(
            self.df.withColumn("val", fn(F.col("val"))), "value")

    def count_local(self) -> "Traversal":
        return self._local("count_local", F.size)

    def _local_by(self, step: str, by: str):
        """Property-modulated local step over a folded array of vertex
        ids (GIE `dedup(local).by('name')` / `order(local).by('name')`,
        rst:255-278): posexplode → ONE property join → re-collect.
        Costs a re-collect shuffle the pure-array forms avoid; only
        valid on fold() output, whose elements are vertex ids."""
        self._need("value", step)
        v = self.graph.vertices
        if by not in v.columns:
            raise KeyError(f"vertex column {by!r} not found")
        key = [_SEED] if _SEED in self.df.columns else []
        ex = self.df.select(
            *key, F.posexplode("val").alias("__pos", "e"))
        j = ex.join(_vprops(self.graph, {by: "__p"}), "e")
        return key, j

    def dedup_local(self, by: str | None = None) -> "Traversal":
        if by is None:
            # array_distinct keeps first occurrence — Gremlin dedup(local)
            return self._local("dedup_local", F.array_distinct)
        key, j = self._local_by("dedup_local", by)
        # first occurrence per property value (struct min orders by
        # __pos first), elements back in original fold order
        firsts = j.groupBy(*key, "__p").agg(
            F.min(F.struct("__pos", "e")).alias("__fe"))
        out = firsts.groupBy(*key).agg(F.transform(
            F.array_sort(F.collect_list("__fe")),
            lambda s: s["e"]).alias("val"))
        return self._next(out, "value", order=())

    def order_local(self, desc: bool = False,
                    by: str | None = None) -> "Traversal":
        if by is None:
            return self._local(
                "order_local", lambda c: F.sort_array(c, asc=not desc))
        key, j = self._local_by("order_local", by)
        out = j.groupBy(*key).agg(F.transform(
            F.array_sort(F.collect_list(F.struct("__p", "e"))),
            lambda s: s["e"]).alias("val"))
        if desc:
            out = out.withColumn("val", F.reverse("val"))
        return self._next(out, "value", order=())

    def range_local(self, lo: int, hi: int) -> "Traversal":
        return self._local(
            "range_local", lambda c: F.slice(c, int(lo) + 1, int(hi - lo)))

    def sum_local(self) -> "Traversal":
        return self._local("sum_local", lambda c: F.aggregate(
            c, F.lit(0).cast("double"), lambda a, x: a + x))

    def min_local(self) -> "Traversal":
        return self._local("min_local", F.array_min)

    def max_local(self) -> "Traversal":
        return self._local("max_local", F.array_max)

    def mean_local(self) -> "Traversal":
        return self._local("mean_local", lambda c: F.aggregate(
            c, F.lit(0).cast("double"), lambda a, x: a + x)
            / F.size(c).cast("double"))

    # -- branch ----------------------------------------------------------
    def branch(self, key: str | None = None) -> "_Branch":
        """branch(key).option(v1, __...).option(v2, __...) (GIE
        branch().option(), rst:296-318): route each element by its
        selector value (None = the element id, str = a vertex
        property); unmatched elements are dropped (Gremlin's behavior
        without a Pick.none option). Compiles to one filtered sub-plan
        per option unioned into a single Catalyst plan."""
        self._need("v", "branch")
        return _Branch(self, key)

    # -- order / paging --------------------------------------------------
    def order(self, by: str | None = None, desc: bool = False) -> "Traversal":
        col = by or {"v": "e", "value": "val", "pairs": "key"}[self.kind]
        return self._next(self.df, order=((col, desc),))

    def _ordered_df(self) -> DataFrame:
        if not self._order:
            return self.df
        cols = [F.col(c).desc() if d else F.col(c).asc() for c, d in self._order]
        return self.df.orderBy(*cols)

    def limit(self, n: int) -> "Traversal":
        return self._next(self._ordered_df().limit(n), order=())

    def range_(self, lo: int, hi: int) -> "Traversal":
        """order()-dependent paging (Gremlin range is order-undefined;
        here it pages the explicit order, or element order).

        Scale note: a global page needs a total order, which ends in a
        single-task window — but the window's INPUT is pre-trimmed
        per partition first (no partition ships more than `hi` rows in
        the page order), so the single task sees ≤ partitions×hi rows
        instead of the full state. Mid-pipeline ranges on full-graph
        states are therefore bounded; still prefer limit() when lo=0.
        """
        from pyspark.sql import Window
        order = self._order or _DEFAULT_ORDER[self.kind]
        ocols = [F.col(c).desc() if d else F.col(c).asc() for c, d in order]
        # per-partition pre-trim: each input partition contributes at
        # most `hi` candidates to the global page
        wp = Window.partitionBy("__pid").orderBy(*ocols)
        trimmed = (
            self.df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__prn", F.row_number().over(wp))
            .where(F.col("__prn") <= hi)
            .drop("__pid", "__prn")
        )
        w = Window.orderBy(*ocols)
        df = (trimmed.withColumn("__rn", F.row_number().over(w))
              .where((F.col("__rn") > lo) & (F.col("__rn") <= hi))
              .drop("__rn"))
        return self._next(df, order=())

    def tail(self, n: int = 1) -> "Traversal":
        """Gremlin tail(n): the LAST n traversers in the current order
        (explicit order() or element order), re-emitted in forward
        order. Distributed top-n on the reversed order — Spark plans
        orderBy+limit as TakeOrderedAndProject (per-partition heaps +
        one driver merge of n rows), never a full sort."""
        order = self._order or _DEFAULT_ORDER[self.kind]
        rev = [F.col(c).asc() if d else F.col(c).desc() for c, d in order]
        return self._next(self.df.orderBy(*rev).limit(int(n)), order=order)

    def sample(self, n: int, seed: int = 42) -> "Traversal":
        """Deterministic uniform sample of n traversers: rank by
        xxhash64(element, seed) and keep the n smallest — a
        distributed top-n (TakeOrderedAndProject), restart- and
        partitioning-stable like the hash draws in
        algorithms/walks.py (same engine-portable draw convention)."""
        cols = _KIND_COLS[self.kind]
        draw = F.xxhash64(*[F.col(c) for c in cols], F.lit(int(seed)))
        df = (self.df
              .orderBy(draw.asc(), *[F.col(c).asc() for c in cols])
              .limit(int(n)))
        return self._next(df, order=())

    # -- loop ------------------------------------------------------------
    def repeat(self, sub: "_Anon") -> "_Repeat":
        return _Repeat(self, sub)

    # -- terminals -------------------------------------------------------
    def toDF(self) -> DataFrame:
        df = self._ordered_df()
        if self.kind == "v":
            return df.select(F.col("e").alias(ID))
        if self.kind == "e":
            return df.select(F.col("esrc").alias(SRC), F.col("edst").alias(DST))
        if self.kind == "value":
            return df.select(*([_SEED] if _SEED in df.columns else []), "val")
        return df

    def toList(self) -> list:
        rows = self.toDF().collect()
        if self.kind in ("v", "value"):
            out = [r[-1] for r in rows]
            return out if self._order else sorted(
                out, key=lambda x: (x is None, str(type(x)), x))
        return [tuple(r) for r in rows]

    def n(self) -> int:
        """Terminal count (the driver-side `.count()` of Gremlin
        consoles; `count()` the step stays in-plan)."""
        return self.df.count()


class _Repeat:
    """repeat(sub).times(k)[.emit()] — bounded unrolled loop: k
    sub-plans composed into one Catalyst plan (GIE likewise bounds
    repeat, rst:340-358) — and repeat(sub).until(cond)[.emit()] — the
    unbounded post-condition loop (rst:340-358), driven round-by-round
    with the same checkpoint discipline as a SuperstepRunner superstep
    (each round's frontier is localCheckpoint-cut so lineage stays
    O(1), one driver count per round for the emptiness test)."""

    def __init__(self, trav: Traversal, sub: _Anon):
        self._trav = trav
        self._sub = sub
        self._emit = False

    def emit(self) -> "_Repeat":
        self._emit = True
        return self

    def times(self, k: int) -> Traversal:
        cur = self._trav
        emitted = []
        for _ in range(int(k)):
            cur = self._sub._apply(cur)
            if self._emit:
                emitted.append(cur.df)
        if self._emit:
            df = emitted[0]
            for d in emitted[1:]:
                df = df.unionByName(d)
            return cur._next(df)
        return cur

    def until(self, cond: _Anon, max_rounds: int = 64) -> "Traversal":
        """Post-condition loop: each round applies `sub` to the active
        frontier, exits the elements whose `cond` sub-traversal is
        non-empty (same seeded-semi-join fabric as where()), and keeps
        looping on the rest until the frontier empties or max_rounds
        (a distributed loop with a never-true condition must
        terminate; GIE likewise bounds repeat).

        Returns lazily so the Gremlin modulator order
        ``repeat(x).until(c).emit()`` works: the driver loop runs on
        first use of the result (df access / further step / terminal)."""
        return _LazyUntil(self, cond, int(max_rounds))

    def _run_until(self, cond: _Anon, max_rounds: int) -> Traversal:
        from graphscope_spark.superstep import _CKPT_LEVEL

        active = self._trav
        out_parts: list[DataFrame] = []
        for _ in range(int(max_rounds)):
            stepped = self._sub._apply(active)
            ck = stepped.df.localCheckpoint(eager=True,
                                            storageLevel=_CKPT_LEVEL)
            stepped = stepped._next(ck)
            if self._emit:
                out_parts.append(stepped.df)
            exited = stepped.where(cond)
            if not self._emit:
                out_parts.append(exited.df)
            active = stepped.not_(cond)
            if active.df.limit(1).count() == 0:
                break
        df = out_parts[0]
        for d in out_parts[1:]:
            df = df.unionByName(d)
        return self._trav._next(df, stepped.kind)


class _LazyUntil(Traversal):
    """Result of repeat(sub).until(cond): defers the driver loop until
    first use so a trailing .emit() (Gremlin's modulator order) can
    still flip emission. After materialization it behaves exactly like
    the Traversal the loop produced."""

    def __init__(self, repeat: "_Repeat", cond: _Anon, max_rounds: int):
        t = repeat._trav
        self.graph = t.graph
        self._order = t._order
        self._seed_df = t._seed_df
        self._track_path = t._track_path
        self._sides = t._sides
        self._repeat = repeat
        self._cond = cond
        self._max_rounds = max_rounds
        self._mat: Traversal | None = None

    def emit(self) -> "_LazyUntil":
        if self._mat is not None:
            raise TypeError("emit(): the until() loop already ran")
        self._repeat._emit = True
        return self

    def _materialize(self) -> Traversal:
        if self._mat is None:
            self._mat = self._repeat._run_until(self._cond, self._max_rounds)
        return self._mat

    @property
    def df(self) -> DataFrame:
        return self._materialize().df

    @property
    def kind(self) -> str:
        return self._materialize().kind


_GROUP_AGGS = {
    "count": lambda c: F.count(c).cast("long"),
    "fold": lambda c: F.sort_array(F.collect_list(c)),
    "sum_": F.sum,
    "min_": F.min,
    "max_": F.max,
    "mean": F.avg,
}


class _Group:
    """group().by(key).by(value) builder (see Traversal.group).
    Terminals/further steps build the (key, val) pairs traversal and
    delegate to it, so the group composes mid-chain."""

    def __init__(self, trav: Traversal):
        self._trav = trav
        self._mods: list = []

    def by(self, mod=None) -> "_Group":
        if len(self._mods) >= 2:
            raise TypeError("group() takes at most two by() modulators")
        self._mods.append(mod)
        return self

    def _built(self) -> Traversal:
        t = self._trav
        key_mod = self._mods[0] if self._mods else None
        val_mod = self._mods[1] if len(self._mods) > 1 else None

        # element -> key mapping
        if key_mod is None:
            keyed = t.df.select(F.col("e"), F.col("e").alias("key"))
        elif isinstance(key_mod, str):
            if key_mod not in t.graph.vertices.columns:
                raise KeyError(f"vertex column {key_mod!r} not found")
            props = _vprops(t.graph, {key_mod: "key"})
            keyed = t.df.join(props, "e").select("e", "key")
        else:
            raise TypeError("group().by(key): key must be None or a "
                            "vertex property name")

        # per-key value: reduce the CONCATENATED stream of per-element
        # sub-results (Gremlin semantics), as one hash-aggregate
        if val_mod is None or isinstance(val_mod, str):
            sub = __.id_() if val_mod is None else __.values(val_mod)
            steps, agg = sub, "fold"
        elif isinstance(val_mod, _Anon):
            if not val_mod._steps or val_mod._steps[-1][0] not in _GROUP_AGGS:
                raise TypeError(
                    "group().by(value): sub-traversal must end in one of "
                    f"{sorted(_GROUP_AGGS)}")
            steps = _Anon(val_mod._steps[:-1])
            agg = val_mod._steps[-1][0]
        else:
            raise TypeError("group().by(value): None, property name, or "
                            "__ sub-traversal ending in an aggregate")

        stream = t._seeded(steps)
        col = {"v": "e", "value": "val", "e": "esrc"}[stream.kind]
        # element→key is functional (identity or a vertex property), so
        # keep the mapping one-row-per-element: a duplicated traverser
        # already contributes its sub-stream once per duplicate through
        # the seeded stream — a duplicated mapping would square it
        # (_vprops is per-id; the identity branch still needs the dedup)
        keyed = keyed.dropDuplicates(["e"])
        per_key = (
            stream.df.select(F.col(_SEED).alias("e"),
                             F.col(col).alias("__x"))
            .join(keyed, "e")
            .groupBy("key")
            .agg(_GROUP_AGGS[agg](F.col("__x")).alias("val"))
        )
        # keys whose stream is empty still appear (count→0, fold→[])
        zero = None
        if agg == "count":
            zero = F.lit(0).cast("long")
        elif agg == "fold":
            zero = F.expr(
                f"CAST(array() AS {per_key.schema['val'].dataType.simpleString()})")
        all_keys = keyed.select("key").distinct()
        out = all_keys.join(per_key, "key", "left")
        if zero is not None:
            out = out.select("key", F.coalesce("val", zero).alias("val"))
        else:
            out = out.where(F.col("val").isNotNull())
        return Traversal(t.graph, out, "pairs")

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._built(), name)


class _Project:
    """project(*tags).by(mod)... builder (see Traversal.project).
    Like _Group, further steps build the multi-column 'pairs'
    traversal and delegate, so project composes mid-chain."""

    def __init__(self, trav: Traversal, tags: tuple):
        if not tags:
            raise TypeError("project() needs at least one tag")
        if len(set(tags)) != len(tags):
            raise TypeError("project() tags must be distinct")
        self._trav = trav
        self._tags = tags
        self._mods: list = []

    def by(self, mod=None) -> "_Project":
        if len(self._mods) >= len(self._tags):
            raise TypeError("more by() modulators than project() tags")
        self._mods.append(mod)
        return self

    def _built(self) -> Traversal:
        t = self._trav
        mods = list(self._mods) + [None] * (len(self._tags) - len(self._mods))
        out = t.df.select(F.col("e"))
        for tag, mod in zip(self._tags, mods):
            if mod is None:
                out = out.withColumn(tag, F.col("e"))
            elif isinstance(mod, str):
                if mod not in t.graph.vertices.columns:
                    raise KeyError(f"vertex column {mod!r} not found")
                out = out.join(_vprops(t.graph, {mod: tag}), "e", "left")
            elif isinstance(mod, _Anon):
                if not mod._steps or mod._steps[-1][0] not in _GROUP_AGGS:
                    raise TypeError(
                        "project().by(__...): sub-traversal must end in "
                        f"one of {sorted(_GROUP_AGGS)}")
                steps = _Anon(mod._steps[:-1])
                agg = mod._steps[-1][0]
                # seed from DISTINCT elements: project is per-traverser
                # local scope, so a duplicated traverser must project
                # its element's own sub-result, not a merged stream
                # (seeding the raw df would double-count through the
                # groupBy below, then hand the inflated value to BOTH
                # duplicate rows)
                stream = t._next(
                    t.df.select("e").dropDuplicates(["e"]))._seeded(steps)
                col = {"v": "e", "value": "val", "e": "esrc"}[stream.kind]
                per = (stream.df
                       .groupBy(F.col(_SEED).alias("e"))
                       .agg(_GROUP_AGGS[agg](F.col(col)).alias(tag)))
                out = out.join(per, "e", "left")
                if agg == "count":
                    # Gremlin: an element with an empty sub-stream
                    # projects count 0, not null
                    out = out.withColumn(
                        tag, F.coalesce(F.col(tag), F.lit(0).cast("long")))
                elif agg == "fold":
                    # ... and fold projects the empty list (same
                    # convention as _Group's empty-key fill)
                    dt = per.schema[tag].dataType.simpleString()
                    out = out.withColumn(
                        tag, F.coalesce(F.col(tag),
                                        F.expr(f"CAST(array() AS {dt})")))
            else:
                raise TypeError("project().by(): None, property name, or "
                                "__ sub-traversal ending in an aggregate")
        return Traversal(t.graph, out.select(*self._tags), "pairs")

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._built(), name)


class _Branch:
    """branch(key).option(value, __...) builder (see
    Traversal.branch): one filtered sub-plan per option, unioned."""

    def __init__(self, trav: Traversal, key: str | None):
        self._trav = trav
        self._key = key
        self._opts: list[tuple[Any, _Anon]] = []

    def option(self, value, sub: _Anon) -> "_Branch":
        self._opts.append((value, sub))
        return self

    def _built(self) -> Traversal:
        if not self._opts:
            raise TypeError("branch() needs at least one option()")
        outs: list[Traversal] = []
        for value, sub in self._opts:
            picked = (self._trav.hasId(value) if self._key is None
                      else self._trav.has(self._key, value))
            outs.append(sub._apply(picked))
        kinds = {o.kind for o in outs}
        if len(kinds) > 1:
            raise TypeError(f"branch options end in mixed kinds {kinds}")
        df = outs[0].df
        for o in outs[1:]:
            df = df.unionByName(o.df)
        return outs[0]._next(df)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._built(), name)


class _Sack:
    """sack(op).by(key) modulator: fold the current element's property
    (or value) into the carried sack column."""

    def __init__(self, t: Traversal, fn: Callable[[Column, Column], Column]):
        self._t = t
        self._fn = fn

    def by(self, key: str | None = None) -> Traversal:
        t = self._t
        keep = [c for c in t.df.columns if c != _SACK]
        if key is None:
            t._need("value", "sack(op).by")
            df, val = t.df, F.col("val")
        elif t.kind == "e":
            if key not in t.graph.edges.columns:
                raise KeyError(f"edge column {key!r} not found")
            props = _eprops(t.graph, {key: "__sv"})
            df, val = t.df.join(props, ["esrc", "edst"]), F.col("__sv")
        elif t.kind == "v":
            if key not in t.graph.vertices.columns:
                raise KeyError(f"vertex column {key!r} not found")
            props = _vprops(t.graph, {key: "__sv"})
            df, val = t.df.join(props, "e"), F.col("__sv")
        else:
            raise TypeError("sack(op).by(key): needs a vertex or edge "
                            "traverser (or key=None on a value traverser)")
        out = df.select(*[F.col(c) for c in keep],
                        self._fn(F.col(_SACK), val).alias(_SACK))
        return t._next(out)


class GraphTraversalSource:
    """`g = traversal(graph)` — reference: interactive session
    `sess.gremlin(g)` returning a traversal source."""

    def __init__(self, graph: LinkGraph, track_path: bool = False,
                 sack_init=None):
        self.graph = graph
        self._track_path = track_path
        self._sack_init = sack_init

    def with_path(self) -> "GraphTraversalSource":
        return GraphTraversalSource(self.graph, track_path=True,
                                    sack_init=self._sack_init)

    def with_sack(self, init) -> "GraphTraversalSource":
        """Gremlin g.withSack(init): every traverser starts with a sack
        holding ``init`` (a literal; per-traverser supplier functions
        are out of scope)."""
        return GraphTraversalSource(self.graph, self._track_path,
                                    sack_init=init)

    withSack = with_sack

    def V(self, *ids) -> Traversal:
        df = self.graph.vertices.select(F.col(ID).alias("e"))
        if ids:
            df = df.where(F.col("e").isin([int(i) for i in ids]))
        if self._track_path:
            df = df.withColumn(_PATH, F.array(F.col("e")))
        if self._sack_init is not None:
            df = df.withColumn(_SACK, F.lit(self._sack_init))
        return Traversal(self.graph, df, "v", track_path=self._track_path)

    def E(self) -> Traversal:
        df = self.graph.edges.select(F.col(SRC).alias("esrc"),
                                     F.col(DST).alias("edst"),
                                     F.col(SRC).alias("eprev"))
        if self._sack_init is not None:
            df = df.withColumn(_SACK, F.lit(self._sack_init))
        return Traversal(self.graph, df, "e")


def traversal(graph: LinkGraph) -> GraphTraversalSource:
    return GraphTraversalSource(graph)
