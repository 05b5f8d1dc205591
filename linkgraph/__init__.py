"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Distributed re-expression of the NetworkX link-analysis core (reference:
TeamNotJava/networkx, surveyed in SURVEY.md) on an edge-table data model:
a graph is a pair of DataFrames ``vertices(id BIGINT, ...)`` and
``edges(src BIGINT, dst BIGINT, weight DOUBLE)``, and every algorithm is an
iterative composition of DataFrame joins and aggregations (Catalyst-optimized,
whole-stage-codegen'd), never per-row Python.

Public API mirrors the NetworkX names so parity tests read 1:1:

- :func:`linkgraph.algos.pagerank.pagerank`            (nx.pagerank)
- :func:`linkgraph.algos.components.connected_components`
- :func:`linkgraph.algos.lpa.label_propagation_communities`
- :func:`linkgraph.algos.triangles.triangles`
"""

from linkgraph.graph import (
    SparkGraph,
    convert_node_labels_to_integers,
    relabel_nodes,
)
from linkgraph.exceptions import (
    PowerIterationFailedConvergence,
    NotImplementedForDirected,
)
from linkgraph.algos.wlhash import (
    weisfeiler_lehman_graph_hash,
    weisfeiler_lehman_subgraph_hashes,
)
from linkgraph.algos.pagerank import pagerank, PowerIterationFailedConvergence
from linkgraph.algos.components import (
    connected_components,
    weakly_connected_components,
    number_connected_components,
    is_connected,
    is_weakly_connected,
)
from linkgraph.algos.triangles import (
    triangles,
    triangle_count,
    clustering,
    average_clustering,
    transitivity,
)
from linkgraph.algos.lpa import label_propagation_communities
from linkgraph.algos.community import (
    modularity,
    louvain_communities,
    leiden_communities,
    greedy_modularity_communities,
    partition_quality,
)
from linkgraph.algos.hierarchy import (
    flow_hierarchy,
    trophic_levels,
    trophic_differences,
    trophic_incoherence_parameter,
    local_reaching_centrality,
    global_reaching_centrality,
)
from linkgraph.algos.cuts import (
    cut_size,
    volume,
    normalized_cut_size,
    conductance,
    edge_expansion,
    mixing_expansion,
    node_expansion,
    boundary_expansion,
)
from linkgraph.algos.mst import (
    minimum_spanning_edges,
    minimum_spanning_tree,
    maximum_spanning_tree,
)
from linkgraph.algos.bipartite import (
    projected_graph,
    weighted_projected_graph,
    overlap_weighted_projected_graph,
    birank,
)
from linkgraph.algos.lpa_variants import (
    asyn_lpa_communities,
    fast_label_propagation_communities,
    asyn_fluidc,
)
from linkgraph.algos.reciprocity import overall_reciprocity, node_reciprocity
from linkgraph.algos.hits import hits
from linkgraph.algos.centrality import eigenvector_centrality, katz_centrality
from linkgraph.algos.betweenness import (
    betweenness_centrality,
    edge_betweenness_centrality,
    percolation_centrality,
)
from linkgraph.algos.cores import (
    core_number,
    k_core,
    k_shell,
    k_crust,
    k_corona,
    k_truss,
    onion_layers,
)
from linkgraph.algos.assortativity import (
    degree_assortativity_coefficient,
    degree_pearson_correlation_coefficient,
)
from linkgraph.algos.setops import (
    intersection,
    difference,
    symmetric_difference,
    compose,
    union,
    complement,
    shortest_path_lengths,
    bfs_layers,
    bfs_tree,
    bfs_tree_edges,
    descendants,
    ancestors,
    descendants_at_distance,
    ego_graph,
    disjoint_union,
    full_join,
    union_all,
    compose_all,
    intersection_all,
    disjoint_union_all,
    quotient_graph,
)
from linkgraph import generators
from linkgraph import multimodal
from linkgraph.multigraph import SparkMultiGraph
from linkgraph.algos.simrank import simrank_similarity, ExceededMaxIterations
from linkgraph.algos.cliques import (
    k_cliques,
    k_clique_count,
    node_clique_counts,
    find_cliques,
    find_cliques_recursive,
    node_clique_number,
    number_of_cliques,
    enumerate_all_cliques,
    make_max_clique_graph,
    make_clique_bipartite,
    max_weight_clique,
)
from linkgraph.algos.dag import (
    lexicographical_topological_sort,
)
from linkgraph.algos.cycles import simple_cycles
from linkgraph.algos.isomorphism import (
    subgraph_matches,
    count_subgraph_matches,
    subgraph_is_isomorphic,
    is_isomorphic,
    could_be_isomorphic,
)
from linkgraph.algos.flow import (
    maximum_flow,
    maximum_flow_value,
    minimum_cut,
    minimum_edge_cut,
    minimum_node_cut,
    edge_disjoint_paths,
    node_disjoint_paths,
    gomory_hu_tree,
    k_edge_components,
    NetworkXUnbounded,
)
from linkgraph.algos.fiedler import (
    algebraic_connectivity,
    fiedler_vector,
    spectral_ordering,
    spectral_bisection,
)
from linkgraph.algos.paths import (
    shortest_path_tree,
    shortest_path,
    single_source_shortest_path_length,
    all_pairs_shortest_path_length,
    bidirectional_shortest_path,
    dijkstra_path,
    dijkstra_path_length,
    bellman_ford_path,
    bellman_ford_path_length,
    predecessor,
    bfs_predecessors,
    bfs_successors,
    bfs_edges,
    generic_bfs_edges,
    bfs_labeled_edges,
)
from linkgraph.algos.covering import (
    is_matching,
    is_maximal_matching,
    is_perfect_matching,
    min_edge_cover,
    is_edge_cover,
)
from linkgraph.algos.cycles import eulerize
from linkgraph.algos.setops import contracted_nodes, contracted_edge, identified_nodes
from linkgraph.algos.chains import chain_decomposition, prefix_tree, prefix_tree_recursive
from linkgraph.algos.matrices import google_matrix, number_of_spanning_trees
from linkgraph import convert
from linkgraph import linalg
from linkgraph.algos.flow import k_edge_subgraphs
from linkgraph.algos.dfs import edge_dfs, edge_bfs
from linkgraph.algos.dag import (
    lowest_common_ancestor,
    all_pairs_lowest_common_ancestor,
    tree_all_pairs_lowest_common_ancestor,
)
from linkgraph.algos.paths import is_path, is_simple_path, path_weight
from linkgraph.algos.components import node_connected_component
from linkgraph.algos.selection import is_dominating_set, is_connected_dominating_set
from linkgraph.algos.assortativity import (
    node_degree_xy,
    node_attribute_xy,
    degree_mixing_dict,
    attribute_mixing_dict,
    mixing_dict,
    degree_mixing_matrix,
    attribute_mixing_matrix,
)
from linkgraph.convert import (
    to_dict_of_dicts,
    from_dict_of_dicts,
    to_dict_of_lists,
    from_dict_of_lists,
    to_edgelist,
    to_pandas_edgelist,
    from_pandas_edgelist,
    to_pandas_adjacency,
    from_pandas_adjacency,
    cytoscape_data,
    cytoscape_graph,
    adjacency_data,
    adjacency_graph,
    tree_data,
    tree_graph,
    to_networkx_graph,
    Graph,
    DiGraph,
    MultiGraph,
    MultiDiGraph,
)
from linkgraph.linalg import (
    adjacency_matrix,
    attr_matrix,
    attr_sparse_matrix,
    directed_laplacian_matrix,
    directed_combinatorial_laplacian_matrix,
    directed_modularity_matrix,
    incidence_matrix,
    laplacian_matrix,
    normalized_laplacian_matrix,
    modularity_matrix,
    bethe_hessian_matrix,
    adjacency_spectrum,
    laplacian_spectrum,
    normalized_laplacian_spectrum,
    modularity_spectrum,
    bethe_hessian_spectrum,
    non_randomness,
)
from linkgraph.algos.distance import (
    incremental_closeness_centrality,
    eccentricity,
    eccentricity_bounds,
    approximate_diameter,
    diameter,
    radius,
    center,
    periphery,
    closeness_centrality,
    harmonic_centrality,
    average_shortest_path_length,
    barycenter,
)
from linkgraph.io.graphml import read_graphml, write_graphml, GraphMLReader, GraphMLWriter
from linkgraph.io.gml import read_gml, write_gml
from linkgraph.io.pajek import read_pajek, write_pajek
from linkgraph.io.gexf import read_gexf, write_gexf, relabel_gexf_graph
from linkgraph.io.graph6 import (
    from_graph6_bytes,
    to_graph6_bytes,
    read_graph6,
    write_graph6,
)
from linkgraph.io.leda import parse_leda, read_leda
from linkgraph.io.sparse6 import (
    from_sparse6_bytes,
    to_sparse6_bytes,
    read_sparse6,
    write_sparse6,
)
from linkgraph.describe import describe
from linkgraph.convert_matrix import (
    to_csr_arrays,
    to_scipy_sparse_array,
    to_numpy_array,
    from_numpy_array,
    from_scipy_sparse_array,
)
from linkgraph.algos.sssp import (
    voronoi_cells,
    shortest_path_length,
    weighted_shortest_path_lengths,
    single_source_weighted_path_length,
    bellman_ford_path_lengths,
    all_pairs_bellman_ford_path_lengths,
    floyd_warshall,
    astar_path,
    astar_path_length,
    has_path,
    NegativeCycleError,
)
from linkgraph.algos.strongly_connected import (
    strongly_connected_components,
    number_strongly_connected_components,
    is_strongly_connected,
    condensation,
    attracting_components,
    number_attracting_components,
    is_semiconnected,
    is_aperiodic,
)
from linkgraph.algos.dag import (
    topological_generations,
    topological_sort,
    is_directed_acyclic_graph,
    transitive_closure,
    dag_longest_path_length,
    GraphContainsCycle,
)
from linkgraph.algos.richclub import rich_club_coefficient, generalized_degree
from linkgraph.algos.bipartite import (
    color as bipartite_color,
    is_bipartite,
    sets as bipartite_sets,
)
from linkgraph.algos.biconnected import (
    biconnected_components,
    articulation_points,
    is_biconnected,
)
from linkgraph.algos.bridges import (
    bridges,
    has_bridges,
    two_edge_connected_components,
)
from linkgraph.algos.matching_weight import (
    max_weight_matching,
    min_weight_matching,
)
from linkgraph.algos.selection import (
    maximal_independent_set,
    maximal_matching,
    voterank,
    dominating_set,
    min_vertex_cover_approx,
)
from linkgraph.algos.planarity import is_planar
from linkgraph.algos.chordal import is_chordal
from linkgraph.algos.tournament import (
    is_tournament,
    score_sequence,
    random_tournament,
    hamiltonian_path,
    is_reachable,
    tournament_matrix,
)
from linkgraph.algos.degrees import s_metric, laplacian_centrality
from linkgraph.algos.assortativity import (
    attribute_assortativity_coefficient,
    numeric_assortativity_coefficient,
)
from linkgraph.algos.cycles import (
    is_eulerian,
    has_eulerian_path,
    cycle_basis,
    eulerian_circuit,
    eulerian_path,
)
from linkgraph.algos.tree import (
    is_tree,
    is_forest,
    is_branching,
    is_arborescence,
)
from linkgraph.algos.flow import edge_connectivity, node_connectivity, stoer_wagner
from linkgraph.algos.triads import triadic_census, triads_by_type, triad_type, is_triad
from linkgraph.algos.swap import directed_edge_swap
from linkgraph.algos.bipartite import (
    maximum_matching as bipartite_maximum_matching,
    to_vertex_cover,
    latapy_clustering,
    average_bipartite_clustering,
    robins_alexander_clustering,
    bipartite_density,
    bipartite_degrees,
)
from linkgraph.algos.cycles import is_semieulerian
from linkgraph.algos.dominance import (
    immediate_dominators,
    dominance_frontiers,
    dominator_pairs,
)
from linkgraph.algos.triangles import square_clustering
from linkgraph.algos.swap import double_edge_swap
from linkgraph.algos.dag import moral_graph, transitive_reduction, lowest_common_ancestors
from linkgraph.algos.branchings import (
    minimum_spanning_arborescence,
    maximum_spanning_arborescence,
)
from linkgraph.algos.classification import (
    harmonic_function,
    local_and_global_consistency,
)
from linkgraph.algos.neighborhood import (
    average_neighbor_degree,
    average_degree_connectivity,
    node_boundary,
    edge_boundary,
    local_bridges,
    effective_size,
    constraint,
    wiener_index,
    global_efficiency,
    local_efficiency,
    schultz_index,
    gutman_index,
    harmonic_diameter,
    closeness_vitality,
    group_degree_centrality,
    group_closeness_centrality,
)
from linkgraph.algos.products import (
    rooted_product,
    corona_product,
    modular_product,
    power,
    tensor_product,
    cartesian_product,
    strong_product,
    lexicographic_product,
)
from linkgraph.algos.linkpred import (
    common_neighbors,
    jaccard_coefficient,
    adamic_adar_index,
    resource_allocation_index,
    preferential_attachment,
    dispersion,
    cn_soundarajan_hopcroft,
    ra_index_soundarajan_hopcroft,
    within_inter_cluster,
    common_neighbor_centrality,
)
from linkgraph.algos.degrees import (
    degrees,
    in_degrees,
    out_degrees,
    degree_histogram,
    degree_centrality,
    is_regular,
    is_k_regular,
)
from linkgraph.algos.walks import number_of_walks
from linkgraph.algos.summarization import dedensify, snap_aggregation
from linkgraph.algos.line import line_graph, line_graph_edges
from linkgraph.algos.time_dependent import cd_index, cd_index_table
from linkgraph.algos.timeseries import visibility_graph, visibility_graph_edges
from linkgraph.algos.graphical import (
    is_graphical,
    is_valid_degree_sequence_erdos_gallai,
    is_valid_degree_sequence_havel_hakimi,
    is_multigraphical,
    is_pseudographical,
    is_digraphical,
)
from linkgraph.algos.dseparation import is_d_separator, find_minimal_d_separator
from linkgraph.algos.density import densest_subgraph, densest_subgraph_rounds
from linkgraph.algos.steiner import steiner_tree
from linkgraph.algos.smallworld import sigma, random_reference
from linkgraph.algos.sparsifiers import spanner
from linkgraph.algos.resistance import resistance_distance
from linkgraph.algos.girth import girth
from linkgraph.algos.simplepaths import all_simple_paths
from linkgraph.algos.assortativity import attribute_mixing, degree_mixing
from linkgraph.algos.currentflow import (
    current_flow_closeness_centrality,
    information_centrality,
    current_flow_betweenness_centrality,
    edge_current_flow_betweenness_centrality,
    kemeny_constant,
    current_flow_betweenness_centrality_subset,
    edge_current_flow_betweenness_centrality_subset,
    approximate_current_flow_betweenness_centrality,
)
from linkgraph.algos.dfs import (
    dfs_edges,
    dfs_tree,
    dfs_preorder_nodes,
    dfs_postorder_nodes,
    dfs_labeled_edges,
)
from linkgraph.algos import approximation
from linkgraph.algos.approximation import (
    christofides,
    treewidth_min_degree,
    treewidth_min_fill_in,
    diameter_2sweep,
    randomized_partitioning,
    one_exchange,
    greedy_tsp,
    ramsey_R2,
    clique_removal,
    max_clique,
    large_clique_size,
    maximum_independent_set,
    min_weighted_vertex_cover,
    min_weighted_dominating_set,
    min_maximal_matching,
    min_edge_dominating_set,
    local_node_connectivity,
    metric_closure,
    simulated_annealing_tsp,
    threshold_accepting_tsp,
    traveling_salesman_problem,
)
from linkgraph.algos.coloring import greedy_color, equitable_color
from linkgraph.algos.spectral import (
    communicability,
    communicability_exp,
    subgraph_centrality,
    subgraph_centrality_exp,
    estrada_index,
    second_order_centrality,
    communicability_betweenness_centrality,
)

__version__ = "0.1.0"

__all__ = [
    "SparkGraph",
    "partition_quality",
    "flow_hierarchy",
    "trophic_levels",
    "trophic_differences",
    "trophic_incoherence_parameter",
    "local_reaching_centrality",
    "global_reaching_centrality",
    "cut_size",
    "volume",
    "normalized_cut_size",
    "conductance",
    "edge_expansion",
    "mixing_expansion",
    "node_expansion",
    "boundary_expansion",
    "bipartite_color",
    "is_bipartite",
    "bipartite_sets",
    "bridges",
    "has_bridges",
    "two_edge_connected_components",
    "biconnected_components",
    "immediate_dominators",
    "cycle_basis",
    "transitive_reduction",
    "lowest_common_ancestors",
    "minimum_spanning_arborescence",
    "maximum_spanning_arborescence",
    "voronoi_cells",
    "is_tree",
    "is_forest",
    "is_branching",
    "is_arborescence",
    "dominance_frontiers",
    "dominator_pairs",
    "articulation_points",
    "maximal_independent_set",
    "maximal_matching",
    "max_weight_matching",
    "min_weight_matching",
    "asyn_fluidc",
    "voterank",
    "dominating_set",
    "s_metric",
    "moral_graph",
    "double_edge_swap",
    "attribute_assortativity_coefficient",
    "numeric_assortativity_coefficient",
    "is_eulerian",
    "has_eulerian_path",
    "eulerian_circuit",
    "eulerian_path",
    "laplacian_centrality",
    "edge_connectivity",
    "node_connectivity",
    "dispersion",
    "triadic_census",
    "square_clustering",
    "harmonic_function",
    "local_and_global_consistency",
    "average_neighbor_degree",
    "average_degree_connectivity",
    "node_boundary",
    "edge_boundary",
    "local_bridges",
    "effective_size",
    "constraint",
    "wiener_index",
    "global_efficiency",
    "local_efficiency",
    "convert_node_labels_to_integers",
    "weisfeiler_lehman_graph_hash",
    "pagerank",
    "PowerIterationFailedConvergence",
    "connected_components",
    "weakly_connected_components",
    "number_connected_components",
    "triangles",
    "triangle_count",
    "clustering",
    "average_clustering",
    "transitivity",
    "label_propagation_communities",
    "overall_reciprocity",
    "node_reciprocity",
    "hits",
    "eigenvector_centrality",
    "katz_centrality",
    "betweenness_centrality",
    "edge_betweenness_centrality",
    "percolation_centrality",
    "is_regular",
    "is_k_regular",
    "number_of_walks",
    "dedensify",
    "snap_aggregation",
    "line_graph",
    "line_graph_edges",
    "ego_graph",
    "cd_index",
    "cd_index_table",
    "visibility_graph",
    "visibility_graph_edges",
    "is_graphical",
    "is_valid_degree_sequence_erdos_gallai",
    "is_valid_degree_sequence_havel_hakimi",
    "is_multigraphical",
    "is_pseudographical",
    "is_digraphical",
    "minimum_edge_cut",
    "minimum_node_cut",
    "edge_disjoint_paths",
    "node_disjoint_paths",
    "gomory_hu_tree",
    "k_edge_components",
    "algebraic_connectivity",
    "fiedler_vector",
    "spectral_ordering",
    "spectral_bisection",
    "shortest_path_tree",
    "shortest_path",
    "single_source_shortest_path_length",
    "all_pairs_shortest_path_length",
    "bidirectional_shortest_path",
    "dijkstra_path",
    "dijkstra_path_length",
    "bellman_ford_path",
    "bellman_ford_path_length",
    "predecessor",
    "bfs_predecessors",
    "bfs_successors",
    "bfs_edges",
    "generic_bfs_edges",
    "bfs_labeled_edges",
    "is_matching",
    "is_maximal_matching",
    "is_perfect_matching",
    "min_edge_cover",
    "is_edge_cover",
    "eulerize",
    "contracted_nodes",
    "contracted_edge",
    "identified_nodes",
    "chain_decomposition",
    "prefix_tree",
    "google_matrix",
    "number_of_spanning_trees",
    "to_dict_of_dicts",
    "from_dict_of_dicts",
    "to_dict_of_lists",
    "from_dict_of_lists",
    "to_edgelist",
    "to_pandas_edgelist",
    "from_pandas_edgelist",
    "to_pandas_adjacency",
    "from_pandas_adjacency",
    "cytoscape_data",
    "cytoscape_graph",
    "adjacency_data",
    "adjacency_graph",
    "tree_data",
    "tree_graph",
    "adjacency_matrix",
    "incidence_matrix",
    "laplacian_matrix",
    "normalized_laplacian_matrix",
    "modularity_matrix",
    "bethe_hessian_matrix",
    "adjacency_spectrum",
    "laplacian_spectrum",
    "normalized_laplacian_spectrum",
    "modularity_spectrum",
    "bethe_hessian_spectrum",
    "non_randomness",
    "k_edge_subgraphs",
    "edge_dfs",
    "edge_bfs",
    "lowest_common_ancestor",
    "all_pairs_lowest_common_ancestor",
    "tree_all_pairs_lowest_common_ancestor",
    "is_path",
    "is_simple_path",
    "path_weight",
    "node_connected_component",
    "is_dominating_set",
    "is_connected_dominating_set",
    "node_degree_xy",
    "node_attribute_xy",
    "degree_mixing_dict",
    "attribute_mixing_dict",
    "mixing_dict",
    "degree_mixing_matrix",
    "attribute_mixing_matrix",
    "node_clique_number",
    "number_of_cliques",
    "enumerate_all_cliques",
    "make_max_clique_graph",
    "make_clique_bipartite",
    "max_weight_clique",
    "lexicographical_topological_sort",
    "triads_by_type",
    "triad_type",
    "is_triad",
    "directed_edge_swap",
    "is_semieulerian",
    "bipartite_maximum_matching",
    "to_vertex_cover",
    "latapy_clustering",
    "average_bipartite_clustering",
    "robins_alexander_clustering",
    "bipartite_density",
    "bipartite_degrees",
    "dfs_edges",
    "dfs_tree",
    "dfs_preorder_nodes",
    "dfs_postorder_nodes",
    "dfs_labeled_edges",
    "current_flow_closeness_centrality",
    "current_flow_betweenness_centrality",
    "edge_current_flow_betweenness_centrality",
    "information_centrality",
    "kemeny_constant",
    "greedy_color",
    "stoer_wagner",
    "approximation",
    "from_graph6_bytes",
    "to_graph6_bytes",
    "read_graph6",
    "write_graph6",
    "from_sparse6_bytes",
    "to_sparse6_bytes",
    "read_sparse6",
    "write_sparse6",
    "parse_leda",
    "read_leda",
    "christofides",
    "diameter_2sweep",
    "randomized_partitioning",
    "one_exchange",
    "greedy_tsp",
    "treewidth_min_degree",
    "communicability",
    "communicability_exp",
    "subgraph_centrality",
    "subgraph_centrality_exp",
    "estrada_index",
    "second_order_centrality",
    "communicability_betweenness_centrality",
    "is_d_separator",
    "find_minimal_d_separator",
    "densest_subgraph",
    "densest_subgraph_rounds",
    "steiner_tree",
    "sigma",
    "random_reference",
    "spanner",
    "barycenter",
    "is_connected",
    "is_weakly_connected",
    "average_shortest_path_length",
    "degree_pearson_correlation_coefficient",
    "quotient_graph",
    "resistance_distance",
    "schultz_index",
    "gutman_index",
    "harmonic_diameter",
    "closeness_vitality",
    "group_degree_centrality",
    "group_closeness_centrality",
    "is_biconnected",
    "girth",
    "all_simple_paths",
    "attracting_components",
    "number_attracting_components",
    "is_semiconnected",
    "is_aperiodic",
    "cn_soundarajan_hopcroft",
    "ra_index_soundarajan_hopcroft",
    "within_inter_cluster",
    "common_neighbor_centrality",
    "all_pairs_bellman_ford_path_lengths",
    "floyd_warshall",
    "astar_path",
    "astar_path_length",
    "weisfeiler_lehman_subgraph_hashes",
    "min_vertex_cover_approx",
    "is_tournament",
    "is_planar",
    "is_chordal",
    "score_sequence",
    "attribute_mixing",
    "degree_mixing",
    "core_number",
    "k_core",
    "k_shell",
    "k_crust",
    "k_corona",
    "k_truss",
    "onion_layers",
    "degree_assortativity_coefficient",
    "weighted_shortest_path_lengths",
    "single_source_weighted_path_length",
    "bellman_ford_path_lengths",
    "has_path",
    "shortest_path_length",
    "describe",
    "generators",
    "SparkMultiGraph",
    "simrank_similarity",
    "read_pajek",
    "write_pajek",
    "read_gexf",
    "write_gexf",
    "rooted_product",
    "corona_product",
    "modular_product",
    "power",
    "leiden_communities",
    "k_cliques",
    "k_clique_count",
    "node_clique_counts",
    "find_cliques",
    "find_cliques_recursive",
    "to_networkx_graph",
    "Graph",
    "DiGraph",
    "MultiGraph",
    "MultiDiGraph",
    "subgraph_matches",
    "count_subgraph_matches",
    "subgraph_is_isomorphic",
    "is_isomorphic",
    "could_be_isomorphic",
    "simple_cycles",
    "maximum_flow",
    "maximum_flow_value",
    "minimum_cut",
    "NetworkXUnbounded",
    "ExceededMaxIterations",
    "eccentricity",
    "eccentricity_bounds",
    "approximate_diameter",
    "diameter",
    "radius",
    "center",
    "periphery",
    "closeness_centrality",
    "incremental_closeness_centrality",
    "harmonic_centrality",
    "multimodal",
    "read_graphml",
    "write_graphml",
    "read_gml",
    "write_gml",
    "to_csr_arrays",
    "to_scipy_sparse_array",
    "to_numpy_array",
    "from_numpy_array",
    "from_scipy_sparse_array",
    "NegativeCycleError",
    "strongly_connected_components",
    "number_strongly_connected_components",
    "is_strongly_connected",
    "condensation",
    "topological_generations",
    "topological_sort",
    "is_directed_acyclic_graph",
    "transitive_closure",
    "dag_longest_path_length",
    "GraphContainsCycle",
    "rich_club_coefficient",
    "generalized_degree",
    "tensor_product",
    "cartesian_product",
    "strong_product",
    "lexicographic_product",
    "bfs_layers",
    "bfs_tree",
    "bfs_tree_edges",
    "descendants",
    "ancestors",
    "descendants_at_distance",
    "disjoint_union",
    "full_join",
    "union_all",
    "compose_all",
    "intersection_all",
    "disjoint_union_all",
    "relabel_nodes",
    "asyn_lpa_communities",
    "fast_label_propagation_communities",
    "NotImplementedForDirected",
    "intersection",
    "difference",
    "symmetric_difference",
    "compose",
    "union",
    "complement",
    "shortest_path_lengths",
    "common_neighbors",
    "jaccard_coefficient",
    "adamic_adar_index",
    "resource_allocation_index",
    "preferential_attachment",
    "degrees",
    "in_degrees",
    "out_degrees",
    "degree_histogram",
    "degree_centrality",
    "modularity",
    "louvain_communities",
    "greedy_modularity_communities",
    "minimum_spanning_edges",
    "minimum_spanning_tree",
    "maximum_spanning_tree",
    "projected_graph",
    "weighted_projected_graph",
    "overlap_weighted_projected_graph",
    "birank",
]

# ---- round-4 continuation: min-cost flow, named path surface, utilities ----
from linkgraph.algos.mincost import (
    network_simplex,
    min_cost_flow,
    min_cost_flow_cost,
    cost_of_flow,
    max_flow_min_cost,
    capacity_scaling,
    NetworkXUnfeasible,
)
from linkgraph.algos.paths import (
    single_source_shortest_path,
    single_source_dijkstra,
    single_source_dijkstra_path,
    single_source_dijkstra_path_length,
    single_source_bellman_ford,
    single_source_bellman_ford_path,
    single_source_bellman_ford_path_length,
    multi_source_dijkstra,
    multi_source_dijkstra_path,
    multi_source_dijkstra_path_length,
    single_target_shortest_path,
    single_target_shortest_path_length,
    all_pairs_shortest_path,
    all_pairs_dijkstra,
    all_pairs_dijkstra_path,
    all_pairs_dijkstra_path_length,
    all_pairs_bellman_ford_path,
    all_pairs_bellman_ford_path_length,
    dijkstra_predecessor_and_distance,
    bellman_ford_predecessor_and_distance,
    bidirectional_dijkstra,
    johnson,
    goldberg_radzik,
    negative_edge_cycle,
    find_negative_cycle,
    all_shortest_paths,
    single_source_all_shortest_paths,
    all_pairs_all_shortest_paths,
    reconstruct_path,
    bfs_beam_edges,
)
from linkgraph.algos.cycles import find_cycle, NetworkXNoCycle
from linkgraph.algos.dag import transitive_closure_dag, dag_longest_path
from linkgraph.algos.components import number_weakly_connected_components
from linkgraph.algos.strongly_connected import (
    kosaraju_strongly_connected_components,
)
from linkgraph.algos.degrees import in_degree_centrality, out_degree_centrality
from linkgraph.algos.mst import maximum_spanning_edges
from linkgraph.algos.isomorphism import (
    fast_could_be_isomorphic,
    faster_could_be_isomorphic,
    vf2pp_is_isomorphic,
    vf2pp_isomorphism,
    vf2pp_all_isomorphisms,
)
from linkgraph.algos.pagerank import stochastic_graph
from linkgraph.function import (
    all_neighbors,
    non_neighbors,
    common_neighbors,
    create_empty_copy,
    add_star,
    add_path,
    add_cycle,
    induced_subgraph,
    reverse_view,
    nodes_with_selfloops,
    is_weighted,
    is_negatively_weighted,
    is_isolate,
    number_of_isolates,
    get_node_attributes,
    set_node_attributes,
    get_edge_attributes,
    set_edge_attributes,
    remove_node_attributes,
    remove_edge_attributes,
    freeze,
    is_frozen,
    equivalence_classes,
    is_empty,
)
from linkgraph.small_graphs import (
    LCF_graph,
    petersen_graph,
    bull_graph,
    diamond_graph,
    tetrahedral_graph,
    octahedral_graph,
    cubical_graph,
    icosahedral_graph,
    dodecahedral_graph,
    desargues_graph,
    heawood_graph,
    moebius_kantor_graph,
    pappus_graph,
    frucht_graph,
    truncated_tetrahedron_graph,
    krackhardt_kite_graph,
    sedgewick_maze_graph,
    paley_graph,
)
from linkgraph.generators import (
    null_graph,
    trivial_graph,
    tadpole_graph,
    complete_bipartite_graph,
    hypercube_graph,
    grid_graph,
    generalized_petersen_graph,
    kneser_graph,
)
from linkgraph.random_graphs import (
    erdos_renyi_graph,
    binomial_graph,
    fast_gnp_random_graph,
    dense_gnm_random_graph,
    newman_watts_strogatz_graph,
    connected_watts_strogatz_graph,
    random_geometric_graph,
    geometric_edges,
    soft_random_geometric_graph,
    waxman_graph,
    margulis_gabber_galil_graph,
    chordal_cycle_graph,
    random_partition_graph,
    gaussian_random_partition_graph,
    relaxed_caveman_graph,
    configuration_model,
    havel_hakimi_graph,
    random_regular_graph,
    random_labeled_tree,
    from_prufer_sequence,
    to_prufer_sequence,
    degree_sequence_tree,
    gn_graph,
    gnr_graph,
    gnc_graph,
    random_lobster,
    random_lobster_graph,
    interval_graph,
    scale_free_graph,
    random_k_out_graph,
    duplication_divergence_graph,
    partial_duplication_graph,
    dual_barabasi_albert_graph,
    extended_barabasi_albert_graph,
    random_powerlaw_tree,
    random_powerlaw_tree_sequence,
    random_clustered_graph,
    random_shell_graph,
    random_cograph,
    random_degree_sequence_graph,
    thresholded_random_geometric_graph,
    geographical_threshold_graph,
    geometric_soft_configuration_graph,
    navigable_small_world_graph,
    uniform_random_intersection_graph,
    k_random_intersection_graph,
    general_random_intersection_graph,
    random_kernel_graph,
    maybe_regular_expander_graph,
    maybe_regular_expander,
    is_regular_expander,
    random_regular_expander_graph,
    random_labeled_rooted_tree,
    random_labeled_rooted_forest,
    random_unlabeled_rooted_tree,
    random_unlabeled_rooted_forest,
    random_unlabeled_tree,
)
from linkgraph.nonisomorphic_trees import (
    nonisomorphic_trees,
    number_of_nonisomorphic_trees,
)
from linkgraph.random_graphs import (
    directed_configuration_model,
    directed_havel_hakimi_graph,
    LFR_benchmark_graph,
    spectral_graph_forge,
    random_internet_as_graph,
)
from linkgraph.joint_degree import (
    is_valid_joint_degree,
    joint_degree_graph,
    is_valid_directed_joint_degree,
    directed_joint_degree_graph,
)
from linkgraph.layout import (
    random_layout,
    circular_layout,
    shell_layout,
    spiral_layout,
    spectral_layout,
    spring_layout,
    fruchterman_reingold_layout,
    bipartite_layout,
    multipartite_layout,
    rescale_layout,
    rescale_layout_dict,
    bfs_layout,
    kamada_kawai_layout,
    arf_layout,
    forceatlas2_layout,
)
from linkgraph.io.textforms import (
    parse_edgelist,
    generate_edgelist,
    write_weighted_edgelist,
    parse_adjlist,
    generate_adjlist,
    parse_gml,
    generate_gml,
    parse_graphml,
    generate_graphml,
    write_graphml_xml,
    write_graphml_lxml,
    parse_pajek,
    generate_pajek,
    generate_gexf,
    read_multiline_adjlist,
    write_multiline_adjlist,
    parse_multiline_adjlist,
    generate_multiline_adjlist,
)
from linkgraph.algos.betweenness import load_centrality, edge_load_centrality
from linkgraph.algos.walks import (
    generate_random_paths,
    panther_similarity,
    panther_vector_similarity,
)
from linkgraph.algos.branchings import maximum_branching, minimum_branching, ArborescenceIterator
from linkgraph.algos.regularity import (
    is_strongly_regular,
    intersection_array,
    is_distance_regular,
    global_parameters,
    hyper_wiener_index,
)
from linkgraph.algos.chordal import (
    chordal_graph_cliques,
    chordal_graph_treewidth,
    find_induced_nodes,
    NetworkXTreewidthBoundExceeded,
)
from linkgraph.algos.dfs import dfs_predecessors, dfs_successors
from linkgraph.algos.flow import average_node_connectivity, is_k_edge_connected
from linkgraph.algos.resistance import effective_graph_resistance
from linkgraph.algos.centrality import (
    eigenvector_centrality_numpy,
    katz_centrality_numpy,
)
from linkgraph.algos.betweenness import (
    betweenness_centrality_subset,
    edge_betweenness_centrality_subset,
)
# --- nx-parity top-level surface: exception hierarchy, generator and IO
# names users reach through the bare package (reference exposes everything
# flat at `networkx.*`) ---
from linkgraph.exceptions import (
    NetworkXException,
    NetworkXError,
    NetworkXPointlessConcept,
    NetworkXAlgorithmError,
    NetworkXUnfeasible,
    NetworkXNoPath,
    NetworkXNoCycle,
    HasACycle,
    NetworkXUnbounded,
    NetworkXNotImplemented,
    NodeNotFound,
    AmbiguousSolution,
    ExceededMaxIterations,
    NotATree,
)
from linkgraph.generators import (
    balanced_tree,
    barabasi_albert_graph,
    barbell_graph,
    binomial_tree,
    caveman_graph,
    circulant_graph,
    circular_ladder_graph,
    complete_graph,
    complete_multipartite_graph,
    connected_caveman_graph,
    cycle_graph,
    empty_graph,
    expected_degree_graph,
    full_rary_tree,
    gnm_random_graph,
    gnp_random_graph,
    grid_2d_graph,
    house_graph,
    house_x_graph,
    karate_club_graph,
    ladder_graph,
    lollipop_graph,
    mycielski_graph,
    mycielskian,
    path_graph,
    planted_partition_graph,
    powerlaw_cluster_graph,
    ring_of_cliques,
    star_graph,
    stochastic_block_model,
    turan_graph,
    watts_strogatz_graph,
    wheel_graph,
    windmill_graph,
)
from linkgraph.function import (
    degree,
    density,
    edges,
    edge_subgraph,
    is_directed,
    isolates,
    neighbors,
    nodes,
    non_edges,
    number_of_edges,
    number_of_nodes,
    number_of_selfloops,
    restricted_view,
    selfloop_edges,
    subgraph,
    subgraph_view,
    to_directed,
    to_undirected,
)
from linkgraph.graph import from_edgelist
from linkgraph.algos.triangles import all_triangles
from linkgraph.algos.setops import reverse
from linkgraph.algos.reciprocity import reciprocity
from linkgraph.algos.neighborhood import efficiency
from linkgraph.io.json_graph import node_link_data, node_link_graph
from linkgraph.io.adjlist import read_adjlist, write_adjlist
from linkgraph.io.edgelist import (
    read_edgelist,
    read_weighted_edgelist,
    write_edgelist,
)
from linkgraph.algos.simplepaths import (
    all_simple_edge_paths,
    shortest_simple_paths,
)
from linkgraph.algos.cycles import (
    chordless_cycles,
    minimum_cycle_basis,
    recursive_simple_cycles,
)
from linkgraph.algos.sssp import (
    floyd_warshall_numpy,
    floyd_warshall_predecessor_and_distance,
)
from linkgraph.algos.flow import minimum_cut_value
from linkgraph.algos.biconnected import biconnected_component_edges
from linkgraph.algos.strongly_connected import is_attracting_component
from linkgraph.algos.dseparation import is_minimal_d_separator
from linkgraph.algos.neighborhood import (
    local_constraint,
    group_in_degree_centrality,
    group_out_degree_centrality,
)
from linkgraph.algos.betweenness import (
    group_betweenness_centrality,
    prominent_group,
)
from linkgraph.algos.kcomponents import (
    all_node_cuts,
    k_components,
    all_pairs_node_connectivity,
)
from linkgraph.algos.dag import (
    all_topological_sorts,
    antichains,
    dag_to_branching,
    root_to_leaf_paths,
)
from linkgraph.algos.treetail import (
    k_factor,
    connected_dominating_set,
    is_connected_dominating_set,
    tree_broadcast_center,
    tree_broadcast_time,
    complete_to_chordal_graph,
    junction_tree,
    join_trees,
    to_nested_tuple,
    from_nested_tuple,
    is_perfect_graph,
    find_asteroidal_triple,
    is_at_free,
)
from linkgraph.algos.mst import (
    EdgePartition,
    SpanningTreeIterator,
    partition_spanning_tree,
    random_spanning_tree,
)
from linkgraph.algos.smallworld import lattice_reference, omega
from linkgraph.algos.swap import connected_double_edge_swap
from linkgraph.generators import (
    chvatal_graph,
    tutte_graph,
    truncated_cube_graph,
    hoffman_singleton_graph,
    dorogovtsev_goltsev_mendes_graph,
    sudoku_graph,
    triangular_lattice_graph,
    hexagonal_lattice_graph,
    hkn_harary_graph,
    hnm_harary_graph,
    triad_graph,
    florentine_families_graph,
    davis_southern_women_graph,
    les_miserables_graph,
)
from linkgraph.algos.triads import all_triads
from linkgraph.io.network_text import generate_network_text, write_network_text
from linkgraph.algos.editdistance import (
    graph_edit_distance,
    optimal_edit_paths,
    optimize_edit_paths,
    optimize_graph_edit_distance,
)
from linkgraph.algos.hybrid import is_kl_connected, kl_connected_subgraph
from linkgraph.algos.polynomials import tutte_polynomial, chromatic_polynomial
from linkgraph.algos.line import inverse_line_graph
from linkgraph.algos.planarity import check_planarity, PlanarEmbedding
from linkgraph.layout import planar_layout, combinatorial_embedding_to_pos
from linkgraph.algos.edge_augmentation import (
    k_edge_augmentation,
    is_k_edge_connected,
    is_locally_k_edge_connected,
)
from linkgraph.io.latex import to_latex_raw, to_latex, write_latex
from linkgraph.drawing import (
    draw,
    draw_networkx,
    draw_networkx_nodes,
    draw_networkx_edges,
    draw_networkx_labels,
    draw_networkx_edge_labels,
    draw_circular,
    draw_kamada_kawai,
    draw_planar,
    draw_random,
    draw_shell,
    draw_spectral,
    draw_spring,
    draw_forceatlas2,
    draw_bipartite,
    display,
    apply_matplotlib_colors,
)


class _Config:
    """``networkx.config`` twin — the reference exposes a mutable
    backend/config namespace; the engine's knobs are Spark confs, so this
    object carries only the compatibility surface."""

    backends = {}
    backend_priority = []
    cache_converted_graphs = False
    warnings_to_ignore = set()

    def __repr__(self):  # pragma: no cover
        return "linkgraph.config(spark-native; tuning lives in Spark confs)"


config = _Config()


def graph_atlas(i: int):
    """``generators/atlas.py`` ``graph_atlas`` — the reference returns
    graph #i of the 1253-graph table from 'An Atlas of Graphs' (Read &
    Wilson 1998). The table is book data, not an algorithm; shipping a
    re-typed copy would be verbatim data duplication, so this engine
    declares it out of scope. ``nonisomorphic_trees`` /
    ``graph_enumeration`` cover the generative slice."""
    raise NotImplementedError(
        "graph_atlas: the Atlas of Graphs table is licensed book data the "
        "engine does not vendor; see nonisomorphic_trees for enumerative "
        "generation"
    )


def graph_atlas_g():
    """See :func:`graph_atlas`."""
    raise NotImplementedError(
        "graph_atlas_g: the Atlas of Graphs table is licensed book data "
        "the engine does not vendor"
    )
from linkgraph.algos.bipartite import (
    hopcroft_karp_matching,
    eppstein_matching,
    is_bipartite_node_set,
    node_redundancy,
    spectral_bipartivity,
    biadjacency_matrix,
    from_biadjacency_matrix,
    collaboration_weighted_projected_graph,
    generic_weighted_projected_graph,
    minimum_weight_full_matching,
    maximal_extendability,
)
from linkgraph.algos.community_extra import (
    is_partition,
    girvan_newman,
    kernighan_lin_bisection,
    k_clique_communities,
    lukes_partitioning,
    edge_betweenness_partition,
    edge_current_flow_betweenness_partition,
    naive_greedy_modularity_communities,
    louvain_partitions,
    leiden_partitions,
    spectral_modularity_bipartition,
    greedy_node_swap_bipartition,
    greedy_source_expansion,
)
from linkgraph.algos.branchings import (
    branching_weight,
    greedy_branching,
    minimal_branching,
)
from linkgraph.algos.tree import centroid
from linkgraph.algos.flow import (
    dinitz,
    edmonds_karp,
    shortest_augmenting_path,
    boykov_kolmogorov,
    preflow_push,
    build_residual_network,
    build_flow_dict,
)
from linkgraph.algos.isomorphism import (
    GraphMatcher,
    DiGraphMatcher,
    MultiGraphMatcher,
    MultiDiGraphMatcher,
    categorical_node_match,
    categorical_edge_match,
    categorical_multiedge_match,
    numerical_node_match,
    numerical_edge_match,
    numerical_multiedge_match,
    generic_node_match,
    generic_edge_match,
    generic_multiedge_match,
    rooted_tree_isomorphism,
    tree_isomorphism,
)
from linkgraph.algos.approximation import asadpour_atsp
from linkgraph.algos.isomorphism import (
    ISMAGS,
    TimeRespectingGraphMatcher,
    TimeRespectingDiGraphMatcher,
)
