"""Knowledge graph over the semantic model — driver-side NetworkX.

Rebuilds the reference's KG capability (reference ``sap_knowledge_graph.py``:
node types :35-38, edge types :44-49, build :110-301, term resolution
:505-531, question resolution :533-578, join paths :580-626, D3 export
:326-368) from the same model JSON. Metadata-scale (hundreds of nodes), so
this deliberately stays on the driver — SURVEY §1.1: "not a GraphFrames
problem". Join-path discovery feeds the SQL layer's join suggestions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import networkx as nx

from .sources.registry import SemanticModel

_STOPWORDS = frozenset(
    "a an and are as at be by for from has have how in is it of on or show "
    "that the this to was what when where which who with all list give me "
    "many much total".split()
)


@dataclass
class Resolution:
    term: str
    kind: str  # 'table' | 'column' | 'object' | 'module'
    target: str
    score: float


class KnowledgeGraph:
    """Typed multigraph: module / table / object / concept nodes;
    contains / groups / joins / refers_to edges."""

    def __init__(self, model: SemanticModel):
        self.model = model
        g = nx.MultiDiGraph()
        for mod in model.modules():
            g.add_node(f"mod:{mod}", kind="module", label=mod)
        for obj_name, obj in model.objects.items():
            g.add_node(f"obj:{obj_name}", kind="object", label=obj_name)
            g.add_edge(f"mod:{obj['module']}", f"obj:{obj_name}", kind="contains")
        for t in model.tables.values():
            g.add_node(f"tbl:{t.name}", kind="table", label=t.name, module=t.module)
            g.add_edge(f"mod:{t.module}", f"tbl:{t.name}", kind="contains")
            g.add_edge(f"obj:{t.business_object}", f"tbl:{t.name}", kind="groups")
            for fk in t.foreign_keys:
                ref = fk.get("references_table") or fk.get("ref_table")
                if ref and f"tbl:{ref}" != f"tbl:{t.name}":
                    g.add_edge(
                        f"tbl:{t.name}", f"tbl:{ref}", kind="joins",
                        condition=fk.get("join_condition") or fk.get("column", ""),
                    )
        for r in model.relationships:
            f_t, t_t = r.get("from_table"), r.get("to_table")
            if f_t and t_t:
                g.add_edge(
                    f"tbl:{f_t}", f"tbl:{t_t}", kind="joins",
                    condition=r.get("join_condition", ""),
                )
        # concept nodes from NL aliases (tables + objects + columns)
        for obj_name, obj in model.objects.items():
            for alias in obj["aliases"]:
                node = f"concept:{alias.lower()}"
                g.add_node(node, kind="concept", label=alias.lower())
                g.add_edge(node, f"obj:{obj_name}", kind="refers_to")
        self.g = g
        self._alias_index = model.column_aliases()

    # -- resolution ---------------------------------------------------------

    def resolve_term(self, term: str) -> list[Resolution]:
        """Exact + substring fuzzy resolution of an NL term against tables,
        objects, concepts, and column aliases."""
        q = term.strip().lower()
        out: list[Resolution] = []
        for t in self.model.tables:
            if q == t.lower():
                out.append(Resolution(term, "table", t, 1.0))
            elif q in t.lower() or t.lower() in q:
                out.append(Resolution(term, "table", t, 0.5))
        for o in self.model.objects:
            label = o.replace("_", " ").lower()
            if q == label:
                out.append(Resolution(term, "object", o, 1.0))
            elif q in label:
                out.append(Resolution(term, "object", o, 0.6))
        for alias, cols in self._alias_index.items():
            if q == alias:
                for tbl, col in cols:
                    out.append(Resolution(term, "column", f"{tbl}.{col}", 0.9))
            elif q in alias or alias in q:
                for tbl, col in cols:
                    out.append(Resolution(term, "column", f"{tbl}.{col}", 0.4))
        for obj_name, obj in self.model.objects.items():
            for alias in obj["aliases"]:
                if q == alias.lower():
                    out.append(Resolution(term, "object", obj_name, 0.95))
        out.sort(key=lambda r: (-r.score, r.kind, r.target))
        return out

    def resolve_question(self, question: str) -> dict:
        """Tokenize (stopword-filtered), resolve each token + bigram, and
        suggest tables/objects/join paths — the reference's
        ``resolve_question`` capability."""
        words = [
            w for w in re.findall(r"[a-z0-9]+", question.lower()) if w not in _STOPWORDS
        ]
        grams = words + [" ".join(p) for p in zip(words, words[1:])]
        tables: dict[str, float] = {}
        objects: dict[str, float] = {}
        for gram in grams:
            for r in self.resolve_term(gram):
                if r.score < 0.5:
                    continue
                if r.kind == "table":
                    tables[r.target] = max(tables.get(r.target, 0), r.score)
                elif r.kind == "object":
                    obj = self.model.objects[r.target]
                    objects[r.target] = max(objects.get(r.target, 0), r.score)
                    for t in obj["tables"]:
                        tables[t] = max(tables.get(t, 0), r.score * 0.8)
                elif r.kind == "column":
                    tbl = r.target.split(".")[0]
                    tables[tbl] = max(tables.get(tbl, 0), r.score * 0.7)
        ranked = sorted(tables.items(), key=lambda kv: -kv[1])
        joins = []
        top = [t for t, _ in ranked[:3]]
        for i in range(len(top)):
            for j in range(i + 1, len(top)):
                p = self.find_join_path(top[i], top[j])
                if p:
                    joins.append(p)
        return {
            "tokens": words,
            "tables": ranked,
            "objects": sorted(objects.items(), key=lambda kv: -kv[1]),
            "join_paths": joins,
        }

    # -- join paths ---------------------------------------------------------

    def _joins_view(self) -> nx.Graph:
        u = nx.Graph()
        for a, b, data in self.g.edges(data=True):
            if data.get("kind") == "joins":
                u.add_edge(a, b, condition=data.get("condition", ""))
        return u

    def find_join_path(self, t1: str, t2: str) -> list[str] | None:
        """Shortest join path between two tables (node-ID list), or None."""
        u = self._joins_view()
        s, d = f"tbl:{t1}", f"tbl:{t2}"
        if s not in u or d not in u:
            return None
        try:
            return [n.split(":", 1)[1] for n in nx.shortest_path(u, s, d)]
        except nx.NetworkXNoPath:
            return None

    def all_join_paths(self, t1: str, t2: str, cutoff: int = 4) -> list[list[str]]:
        u = self._joins_view()
        s, d = f"tbl:{t1}", f"tbl:{t2}"
        if s not in u or d not in u:
            return []
        return [
            [n.split(":", 1)[1] for n in p]
            for p in nx.all_simple_paths(u, s, d, cutoff=cutoff)
        ]

    # -- exports ------------------------------------------------------------

    def stats(self) -> dict:
        kinds: dict[str, int] = {}
        for _, data in self.g.nodes(data=True):
            kinds[data.get("kind", "?")] = kinds.get(data.get("kind", "?"), 0) + 1
        ekinds: dict[str, int] = {}
        for _, _, data in self.g.edges(data=True):
            ekinds[data.get("kind", "?")] = ekinds.get(data.get("kind", "?"), 0) + 1
        return {
            "nodes": self.g.number_of_nodes(),
            "edges": self.g.number_of_edges(),
            "node_kinds": kinds,
            "edge_kinds": ekinds,
        }

    def to_d3(self) -> dict:
        """D3 force-layout export: {nodes, links, stats}."""
        nodes = [
            {"id": n, **{k: v for k, v in d.items()}}
            for n, d in self.g.nodes(data=True)
        ]
        links = [
            {"source": a, "target": b, "kind": d.get("kind", "")}
            for a, b, d in self.g.edges(data=True)
        ]
        return {"nodes": nodes, "links": links, "stats": self.stats()}
