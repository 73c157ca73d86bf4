"""Heterogeneous (typed) property graph: the reference's core data model.

Reference parity: ``/root/reference/link_prediction.py:17-28`` declares 4 node
types and 7 typed relations (including reverse relations added by
``T.ToUndirected``); the per-type tables are built at
``link_prediction_metadata.py:380-422``. SURVEY.md §1.5 promises exactly this
shape: ``{vertex_type: DataFrame}`` + ``{(src_type, rel, dst_type): DataFrame}``.

Every vertex table must expose an ``id`` column (plus arbitrary attribute
columns); every edge table must expose ``src``/``dst`` columns typed like the
endpoint tables' ids. All operations are plain DataFrame ops — per-relation
degree aggregates, reverse-relation unions, endpoint validation via anti
joins, and a typed→homogeneous lowering (dense global ids over the union of
all typed vertices) so the homogeneous algorithms (PageRank, CC, LPA,
triangles) run on any chosen relation subset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.ids import dense_ids_scalable

EdgeKey = tuple[str, str, str]  # (src_type, relation, dst_type)

# global-key separator for the homogeneous lowering: the ASCII unit separator
# cannot appear in type names and is vanishingly unlikely in ids — '|' or '-'
# would let an id containing the separator collide across types
_SEP = "\x1f"


def _vkey(vtype: str, id_col) -> "F.Column":
    # concat_ws silently SKIPS nulls (a null id would collapse onto the bare
    # type name, fusing all null-id rows into one phantom vertex) — fail loud
    guarded = F.when(
        id_col.isNull(),
        F.raise_error(F.lit(f"null id in vertex/edge of type {vtype!r}")),
    ).otherwise(id_col.cast("string"))
    return F.concat_ws(_SEP, F.lit(vtype), guarded)


@dataclass
class HeteroGraph:
    """``vertices``: type → DataFrame(id, *attrs); ``edges``: (src_type,
    relation, dst_type) → DataFrame(src, dst, *attrs)."""

    vertices: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[EdgeKey, DataFrame] = field(default_factory=dict)

    # -- construction -------------------------------------------------------
    def add_vertices(self, vtype: str, df: DataFrame, id_col: str = "id") -> None:
        if id_col != "id":
            df = df.withColumnRenamed(id_col, "id")
        if "id" not in df.columns:
            raise ValueError(f"vertex table for {vtype!r} needs an 'id' column")
        self.vertices[vtype] = df

    def add_edges(
        self,
        src_type: str,
        relation: str,
        dst_type: str,
        df: DataFrame,
        src_col: str = "src",
        dst_col: str = "dst",
    ) -> None:
        if src_type not in self.vertices or dst_type not in self.vertices:
            raise ValueError(
                f"add vertex types {src_type!r}/{dst_type!r} before the relation"
            )
        if src_col != "src":
            df = df.withColumnRenamed(src_col, "src")
        if dst_col != "dst":
            df = df.withColumnRenamed(dst_col, "dst")
        self.edges[(src_type, relation, dst_type)] = df

    # -- lookup -------------------------------------------------------------
    def relation(self, name: str) -> tuple[EdgeKey, DataFrame]:
        """Resolve a relation by bare name; error if ambiguous/absent."""
        hits = [(k, v) for k, v in self.edges.items() if k[1] == name]
        if not hits:
            raise KeyError(f"no relation named {name!r}")
        if len(hits) > 1:
            raise KeyError(
                f"relation {name!r} is ambiguous: {[k for k, _ in hits]}"
            )
        return hits[0]

    # -- transforms ---------------------------------------------------------
    def add_reverse(
        self, relation: str | None = None, prefix: str = "rev_"
    ) -> "HeteroGraph":
        """ToUndirected analog (``/root/reference/link_prediction.py:27``):
        add ``(dst_type, prefix+rel, src_type)`` with src/dst swapped — for
        ``relation=None`` every relation gets its reverse. Self-reverse
        relations (same name both ways) are not duplicated."""
        out = HeteroGraph(dict(self.vertices), dict(self.edges))
        keys = (
            [self.relation(relation)[0]]
            if relation is not None
            else list(self.edges.keys())
        )
        for (st, rel, dt) in keys:
            rkey = (dt, prefix + rel, st)
            if rkey in out.edges:
                continue
            df = self.edges[(st, rel, dt)]
            out.edges[rkey] = df.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                *[c for c in df.columns if c not in ("src", "dst")],
            )
        return out

    # -- analytics ----------------------------------------------------------
    def degrees(self, relation: str, side: str = "dst") -> DataFrame:
        """Per-vertex degree under one typed relation: (id, degree), zero
        rows included for degree-0 vertices of the side's type."""
        if side not in ("src", "dst"):
            raise ValueError(f"side must be src|dst, got {side!r}")
        key, df = self.relation(relation)
        vtype = key[0] if side == "src" else key[2]
        deg = df.groupBy(F.col(side).alias("id")).agg(
            F.count("*").alias("degree")
        )
        return (
            self.vertices[vtype]
            .select("id")
            .join(deg, "id", "left")
            .select(
                "id", F.coalesce("degree", F.lit(0)).cast("long").alias("degree")
            )
        )

    def meta_counts(self) -> DataFrame:
        """One-row-per-type/relation cardinality summary:
        (kind ∈ {vertex, edge}, name, n). Unions of tiny aggregates."""
        if not self.vertices and not self.edges:
            raise ValueError("empty HeteroGraph: add vertices/edges first")
        parts = []
        for vtype, df in sorted(self.vertices.items()):
            parts.append(
                df.agg(
                    F.lit("vertex").alias("kind"),
                    F.lit(vtype).alias("name"),
                    F.count("*").alias("n"),
                )
            )
        for (st, rel, dt), df in sorted(self.edges.items()):
            parts.append(
                df.agg(
                    F.lit("edge").alias("kind"),
                    F.lit(f"{st}-{rel}-{dt}").alias("name"),
                    F.count("*").alias("n"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def validate(self) -> dict[str, int]:
        """Dangling-endpoint audit: per relation, count edge endpoints missing
        from their vertex table (anti joins — distributed, no collect)."""
        report: dict[str, int] = {}
        for (st, rel, dt), df in self.edges.items():
            miss_src = (
                df.select("src")
                .join(
                    self.vertices[st].select(F.col("id").alias("src")),
                    "src",
                    "left_anti",
                )
                .count()
            )
            miss_dst = (
                df.select("dst")
                .join(
                    self.vertices[dt].select(F.col("id").alias("dst")),
                    "dst",
                    "left_anti",
                )
                .count()
            )
            report[f"{st}-{rel}-{dt}"] = miss_src + miss_dst
        return report

    def to_homogeneous(
        self, relations: list[str] | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """Lower to one (vertices, edges) pair with dense global vertex ids.

        Global key = ``"<type>|<id>"``; ids assigned with the scalable
        two-phase counter (no single-task window). Returns
        (vertices(vertex_id, vtype, id), edges(src, dst, relation)).
        """
        keys = (
            [self.relation(r)[0] for r in relations]
            if relations is not None
            else list(self.edges.keys())
        )
        vparts = [
            df.select(_vkey(vt, F.col("id")).alias("vkey"))
            for vt, df in sorted(self.vertices.items())
        ]
        allv = vparts[0]
        for p in vparts[1:]:
            allv = allv.unionByName(p)
        vids = dense_ids_scalable(allv.distinct(), "vkey", id_col="vertex_id")
        vertices = vids.select(
            "vertex_id",
            F.split(F.col("vkey"), _SEP, 2).getItem(0).alias("vtype"),
            F.split(F.col("vkey"), _SEP, 2).getItem(1).alias("id"),
        )
        eparts = []
        for (st, rel, dt) in keys:
            df = self.edges[(st, rel, dt)]
            eparts.append(
                df.select(
                    _vkey(st, F.col("src")).alias("skey"),
                    _vkey(dt, F.col("dst")).alias("dkey"),
                    F.lit(rel).alias("relation"),
                )
            )
        alle = eparts[0]
        for p in eparts[1:]:
            alle = alle.unionByName(p)
        edges = (
            alle.join(
                vids.select(F.col("vkey").alias("skey"), F.col("vertex_id").alias("src")),
                "skey",
            )
            .join(
                vids.select(F.col("vkey").alias("dkey"), F.col("vertex_id").alias("dst")),
                "dkey",
            )
            .select("src", "dst", "relation")
        )
        return vertices, edges


def hetero_aggregate(
    graph: HeteroGraph,
    features: dict[str, DataFrame],
    dim: int,
    relations: list[str] | None = None,
    agg: str = "mean",
    combine: str = "sum",
    id_col: str = "id",
    feature_col: str = "features",
) -> dict[str, DataFrame]:
    """Per-relation typed message passing with per-destination-type fan-in —
    the data side of PyG's ``to_hetero`` dispatch (reference:
    ``/root/reference/halvesting_geometric/modules/modeling_link_prediction.py:129``
    converts one homogeneous GNN into per-relation convolutions whose outputs
    are summed per destination node type; identity weights here, learned
    parameters stay out of scope per SURVEY §7.3).

    ``features``: ``{vertex_type: DataFrame(id_col, feature_col)}`` — every
    relation whose SOURCE type has a feature table participates (messages
    flow src→dst); relations with un-featured sources are skipped, mirroring
    to_hetero's behavior of only convolving relations whose inputs exist.
    ``relations`` restricts to the named relations (bare names, resolved via
    :meth:`HeteroGraph.relation`).

    Per relation the elementwise ``agg`` (mean/sum/max — the bounded-state
    Arrow kernel of :func:`~.neighbors.aggregate_neighbors`) reduces each
    destination's gathered source vectors; then per destination type the
    per-relation vectors fan in elementwise (``combine``: 'sum' — PyG
    HeteroConv's default — or 'mean' over the relations that reached the
    vertex).

    Returns ``{dst_type: DataFrame(id, n_rels, nbr_total, vec)}`` — only
    destination types reached by at least one participating relation appear,
    and within them only vertices with >=1 in-neighbor (to_hetero's conv
    likewise emits zero vectors only via self-loops, which this data-side
    analog does not add).

    Scale shape: one gather join + one Arrow partial-reduce per relation
    (each shuffles on the relation's own dst key), then a dim-bounded
    posexplode + (id, pos) groupBy per destination type — the fan-in state
    per vertex is ``dim`` doubles regardless of relation count.
    """
    if combine not in ("sum", "mean"):
        raise ValueError(f"combine must be sum|mean, got {combine!r}")
    from halvesting_geometric_spark.operators.neighbors import (
        aggregate_neighbors,
    )

    keys = (
        [graph.relation(r)[0] for r in relations]
        if relations is not None
        else sorted(graph.edges.keys())
    )
    per_dst: dict[str, list[DataFrame]] = {}
    for (st, rel, dt) in keys:
        if st not in features:
            continue
        r = aggregate_neighbors(
            features[st],
            graph.edges[(st, rel, dt)],
            dim,
            id_col=id_col,
            feature_col=feature_col,
            agg=agg,
            direction="in",
        )
        per_dst.setdefault(dt, []).append(
            r.select(
                F.col("vertex_id").alias("id"),
                F.lit(rel).alias("rel"),
                "nbr_count",
                "agg_vec",
            )
        )
    out: dict[str, DataFrame] = {}
    for dt, parts in per_dst.items():
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        totals = u.groupBy("id").agg(
            F.count("*").cast("long").alias("n_rels"),
            F.sum("nbr_count").cast("long").alias("nbr_total"),
        )
        vec = (
            u.select("id", F.posexplode("agg_vec").alias("pos", "v"))
            .groupBy("id", "pos")
            .agg(F.sum("v").alias("v"))
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("vec")
            )
        )
        res = totals.join(vec, "id")
        if combine == "mean":
            res = res.withColumn(
                "vec",
                F.transform(F.col("vec"), lambda v: v / F.col("n_rels")),
            )
        out[dt] = res.select("id", "n_rels", "nbr_total", "vec")
    return out
