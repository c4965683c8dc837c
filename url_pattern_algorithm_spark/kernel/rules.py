"""Rewrite-rule learning from duplicate clusters + rule application.

Parity targets (all in /root/reference/):
- cluster file parse            — InputUtil.getClustersFromFile, InputUtil.java:169-186
- duplicate node-pair detection — TreeNode.identifyDuplicateNodes, TreeNode.java:756-802
- overlap kernel                — TreeNode.checkTwoNodeSimilarOrNot1, TreeNode.java:666-696
- key-to-key mapping            — TreeNode.findKeyToKeyMapping, TreeNode.java:805-839
- candidate rule generation     — TreeNode.rewrite, TreeNode.java:842-872
- deployable-rule selection     — Fun.selectDeloyableRule, Fun.java:354-457
- rule emission                 — Fun.getLeafTreeNodesPatterns, Fun.java:615-644
- rule application              — LinkEdge.rewrite, LinkEdge.java:93-130;
                                  CalculateUtil.rewriteFromFile, CalculateUtil.java:659-724

Documented reference bugs NOT copied (SURVEY.md §7 risk register):
- the cycle-break comparator inversion (Fun.java:436 reads ``overlapRate >
  minOverlapRate`` with minOverlapRate initialized to +inf, so the original
  NPEs on any real cycle) — we implement the intended min-overlap deletion;
- HashMap/HashSet iteration orders are replaced by deterministic orders
  (cluster order, node-id order, first-appearance key order, rule list order).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from url_pattern_algorithm_spark.kernel.canonical import (
    check_flag,
    sort_keys,
    standard_key_value,
)
from url_pattern_algorithm_spark.kernel.classify import (
    all_keys,
    distinct_values_folded,
)
from url_pattern_algorithm_spark.kernel.tokenize import first_value, tokenize_full
from url_pattern_algorithm_spark.kernel.tree import (
    TreeBuilder,
    TreeNode,
    Url,
    escape_star,
    java_split,
    structural_match,
)


@dataclass
class LinkEdge:
    """Generalization edge between two similar nodes (LinkEdge.java:13-56)."""

    src: TreeNode
    dst: TreeNode
    pattern: str = ""
    map_key_num: int = 0
    overlap_rate: float = 0.0


@dataclass
class Cluster:
    """URLs known to render the same page (Cluster.java)."""

    urls: list[Url] = field(default_factory=list)


def parse_cluster_lines(lines: list[str], min_size: int = 10) -> list[Cluster]:
    """getClustersFromFile (InputUtil.java:169-186): '#' lines delimit
    clusters; only clusters with > min_size URLs survive. The final cluster is
    dropped unless followed by a '#' line — faithful to the reference."""
    clusters: list[Cluster] = []
    current: Cluster | None = None
    for line in lines:
        if line == "#":
            if current is not None and len(current.urls) > min_size:
                clusters.append(current)
            current = Cluster()
        elif current is not None:
            u = Url.parse(line)
            if u is not None:
                current.urls.append(u)
    return clusters


def overlap_rate(cluster: Cluster, node1: TreeNode, node2: TreeNode) -> float:
    """checkTwoNodeSimilarOrNot1 (TreeNode.java:666-696): fraction of cluster
    URLs (with multiplicity) found in node1 or node2, over the *sum* of the
    two nodes' URL-list sizes."""
    urls1 = {u.url for u in node1.urls}
    urls2 = {u.url for u in node2.urls}
    num = sum(1 for u in cluster.urls if u.url in urls1 or u.url in urls2)
    return num / (len(node1.urls) + len(node2.urls))


def identify_duplicate_nodes(
    builder: TreeBuilder, clusters: list[Cluster]
) -> list[tuple[TreeNode, TreeNode, float]]:
    """identifyDuplicateNodes (TreeNode.java:756-802).

    Relevant nodes per cluster come from the (url -> containing nodes)
    membership index (Fun.prepareForRuleGeneration, Fun.java:323-341) — the
    equi-join formulation; ordered by node id for determinism. The cheap
    upper-bound prune (|cluster| / (n1+n2) < 0.5, TreeNode.java:771-774) runs
    before the overlap kernel. Direction: fewer-distinct-keys node is the
    source; ties break toward the smaller node id (TreeNode.java:779-796).
    """
    membership: dict[str, set[int]] = {}
    by_id: dict[int, TreeNode] = {n.id: n for n in builder.nodes}
    for node in builder.nodes:
        for u in node.urls:
            membership.setdefault(u.url, set()).add(node.id)
    pairs: list[tuple[TreeNode, TreeNode, float]] = []
    for cluster in clusters:
        ids: set[int] = set()
        for u in cluster.urls:
            ids |= membership.get(u.url, set())
        relevant = [by_id[i] for i in sorted(ids)]
        for j in range(len(relevant)):
            for k in range(j + 1, len(relevant)):
                n1, n2 = relevant[j], relevant[k]
                bound = len(cluster.urls) / (len(n1.urls) + len(n2.urls))
                if bound < 0.5:
                    continue
                rate = overlap_rate(cluster, n1, n2)
                if rate < 0.5:
                    continue
                kn1 = len(_node_keys(n1))
                kn2 = len(_node_keys(n2))
                if kn1 < kn2:
                    pairs.append((n1, n2, rate))
                elif kn1 > kn2:
                    pairs.append((n2, n1, rate))
                elif n1.id < n2.id:
                    pairs.append((n1, n2, rate))
                else:
                    pairs.append((n2, n1, rate))
    return pairs


def _node_keys(node: TreeNode) -> list[str]:
    """all_keys of a node's URLs, memoized on the node (pure function of the
    node's frozen url list; the same node participates in many candidate
    pairs, so recomputation dominated rule-learning cost)."""
    cache = node.__dict__.get("_keys_cache")
    if cache is None:
        cache = all_keys([u.pairs for u in node.urls])
        node.__dict__["_keys_cache"] = cache
    return cache


def _node_distinct_folded(node: TreeNode, key: str) -> list[str]:
    """distinct_values_folded per (node, key), memoized on the node — same
    math as TreeNode.getValuesInTheKey, computed once instead of once per
    (key1, key2) combo per candidate pair."""
    cache = node.__dict__.setdefault("_dv_cache", {})
    if key not in cache:
        cache[key] = distinct_values_folded(key, [u.pairs for u in node.urls])
    return cache[key]


def rate_of_common_values(
    node1: TreeNode, node2: TreeNode, key1: str, key2: str
) -> float:
    """rateOfCommonValues (TreeNode.java:805-818): |shared distinct folded
    values| over (|urls1| + |urls2| - shared)."""
    v1 = _node_distinct_folded(node1, key1)
    v2 = set(_node_distinct_folded(node2, key2))
    shared = sum(1 for v in v1 if v in v2)
    return shared / (len(node1.urls) + len(node2.urls) - shared)


def find_key_mapping(s: TreeNode, t: TreeNode) -> list[tuple[str, str]]:
    """findKeyToKeyMapping (TreeNode.java:821-839): per key2 in t, the key1 in
    s maximizing shared-value rate (>= comparison: the last max wins, over
    deterministic first-appearance key order); kept if rate >= 0.5."""
    keys1 = _node_keys(s)
    keys2 = _node_keys(t)
    out: list[tuple[str, str]] = []
    for key2 in keys2:
        best_rate, best_key = -1.0, None
        for key1 in keys1:
            rate = rate_of_common_values(s, t, key1, key2)
            if rate >= best_rate:
                best_rate, best_key = rate, key1
        if best_key is not None and best_rate >= 0.5:
            out.append((best_key, key2))
    return out


def generate_rule(pair: tuple[TreeNode, TreeNode, float]) -> LinkEdge:
    """TreeNode.rewrite (TreeNode.java:842-872): build the rewrite pattern —
    mapped keys -> 'key2:key1/' (replace); unmapped node2 keys with one
    distinct value -> 'key2:#value/' (keep); else 'key2:*value/' (ignore,
    value = first distinct value). Attaches the edge to both nodes."""
    node1, node2, rate = pair
    key_pairs = find_key_mapping(node1, node2)
    mapped = set()
    pattern = ""
    for key1, key2 in key_pairs:
        pattern += f"{key2}:{key1}/"
        mapped.add(key2)
    for key in _node_keys(node2):
        if key in mapped:
            continue
        vals = _node_distinct_folded(node2, key)
        if len(vals) == 1:
            pattern += f"{key}:#{vals[0]}/"
        else:
            pattern += f"{key}:*{vals[0]}/"
    edge = LinkEdge(node1, node2, pattern, len(key_pairs), rate)
    node1.from_edges.append(edge)
    node2.to_edges.append(edge)
    return edge


def candidate_rule_generation(
    builder: TreeBuilder, clusters: list[Cluster]
) -> list[LinkEdge]:
    """Fun.candidateRuleGeneration (Fun.java:344-352)."""
    return [generate_rule(p) for p in identify_duplicate_nodes(builder, clusters)]


def _bfs(root: TreeNode):
    queue = [root]
    while queue:
        node = queue.pop(0)
        yield node
        queue.extend(node.children)


def select_deployable_rules(builder: TreeBuilder) -> None:
    """Fun.selectDeloyableRule (Fun.java:354-457).

    Pass 1: a node with several out-edges keeps only the max-overlap edge
    (first max wins, strict >), removing the losers from their end nodes'
    in-edge lists. Pass 2: follow single out-edges from every node; on a
    cycle, delete the minimum-overlap edge in the cycle (the reference's
    inverted comparator at Fun.java:436 is a documented bug, not copied).
    Cycle identity uses node ids, not the reference's approximate
    (pattern, size) equals (TreeNode.java:54-62) — documented divergence.
    """
    root = builder.root
    if root is None:
        return
    for node in _bfs(root):
        if len(node.from_edges) > 1:
            best = 0  # first max wins (strict >, Fun.java:365-388)
            for i in range(1, len(node.from_edges)):
                if node.from_edges[i].overlap_rate > node.from_edges[best].overlap_rate:
                    best = i
            keep = node.from_edges[best]
            for e in node.from_edges:
                if e is not keep:
                    e.dst.to_edges.remove(e)
            node.from_edges = [keep]
    for node in _bfs(root):
        # walk single out-edges; detect return to `node`
        path: list[LinkEdge] = []
        seen_ids = {node.id}
        cur = node
        cycle = False
        while cur.from_edges:
            edge = cur.from_edges[0]
            path.append(edge)
            cur = edge.dst
            if cur.id == node.id:
                cycle = True
                break
            if cur.id in seen_ids:  # cycle not through `node`; handled there
                break
            seen_ids.add(cur.id)
        if cycle:
            weakest = min(path, key=lambda e: e.overlap_rate)
            weakest.src.from_edges.remove(weakest)
            weakest.dst.to_edges.remove(weakest)


def emit_rules(builder: TreeBuilder) -> list[tuple[str, str]]:
    """Fun.getLeafTreeNodesPatterns (Fun.java:615-644): BFS over every node;
    emit (escaped keyed pattern, rule pattern) for nodes with a surviving
    out-edge, else their first in-edge."""
    out: list[tuple[str, str]] = []
    if builder.root is None:
        return out
    for node in _bfs(builder.root):
        escaped = escape_star(node.pattern_str)
        if node.from_edges:
            out.append((escaped, node.from_edges[0].pattern))
        elif node.to_edges:
            out.append((escaped, node.to_edges[0].pattern))
    return out


def apply_rule(rule_pattern: str, pairs) -> str:
    """LinkEdge.rewrite / CalculateUtil.rewriteFromFile application step
    (LinkEdge.java:93-130, CalculateUtil.java:683-718): re-emit the URL from
    the rule — keep('#')/ignore('*') render the literal value with the marker
    stripped (identical rendering, LinkEdge.java:118-123), replace renders the
    URL's value under the mapped source key; keys ordered path-first."""
    parts = java_split(rule_pattern, "/")
    keys = []
    valmap: dict[str, str] = {}
    for part in parts:
        k, _, v = part.partition(":")
        keys.append(k)
        valmap[k] = v
    ordered = sort_keys(keys)
    result = "http:/"
    for i in range(len(parts)):
        key = ordered[i]
        if not key:
            continue
        value = valmap[key]
        flag = check_flag(ordered[i - 1] if i > 0 else None, key)
        if value.startswith("#") or value.startswith("*"):
            result += standard_key_value(key, value[1:], flag)
        else:
            result += standard_key_value(key, first_value(pairs, value), flag)
    return result


def rewrite_url(rules: list[tuple[str, str]], url: str) -> str:
    """rewriteFromFile (CalculateUtil.java:659-724): first rule whose keyed
    pattern structurally matches (star '.*') rewrites the URL; otherwise the
    URL passes through. Rules iterate in list order (deterministic replacement
    for the reference's HashMap order)."""
    pairs = tokenize_full(url)
    if pairs is None:
        return url
    for pattern, rule in rules:
        if structural_match(pattern, pairs, star=".*"):
            return apply_rule(rule, pairs)
    return url


def compression_ratio(rules: list[tuple[str, str]], urls: list[str]) -> float:
    """Fun.java:550-568 / RewriteTool.java:49-66: |distinct rewritten| /
    |distinct original|."""
    orig = set(urls)
    rewritten = {rewrite_url(rules, u) for u in orig}
    return len(rewritten) / len(orig) if orig else 1.0
