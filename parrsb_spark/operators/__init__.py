from parrsb_spark.operators.pagerank import pagerank, personalized_pagerank
from parrsb_spark.operators.hits import hits
from parrsb_spark.operators.kcore import kcore
from parrsb_spark.operators.bfs import bfs_distances
from parrsb_spark.operators.sssp import sssp
from parrsb_spark.operators.components import connected_components, cc_bfs_single_seed
from parrsb_spark.operators.scc import bowtie_classes, condensation_levels, strongly_connected_components
from parrsb_spark.operators.triangles import (
    clustering_coefficients,
    triangle_counts,
    triangle_total,
)
from parrsb_spark.operators.labelprop import label_propagation
from parrsb_spark.operators.community import louvain_moves, modularity, modularity_by_community
from parrsb_spark.operators.walks import random_walks
from parrsb_spark.operators.graphstats import degree_assortativity, reciprocity
from parrsb_spark.operators.linkpred import link_prediction_scores
from parrsb_spark.operators.truss import truss
from parrsb_spark.operators.anf import (
    anf_masks,
    ball_estimates,
    effective_diameter,
    harmonic_centrality_estimates,
    neighborhood_function,
)
from parrsb_spark.operators.fiedler import fiedler
from parrsb_spark.operators.rsb import rsb_partition, rsb_resumable
from parrsb_spark.operators.hierarchy import rsb_partition_two_level, two_level_stats
from parrsb_spark.operators.rcb import rcb_partition
from parrsb_spark.operators.rib import rib_partition
from parrsb_spark.operators.partition import partition_graph
from parrsb_spark.operators.stats import edge_cut, comm_volume, neighbor_census, partition_sizes
from parrsb_spark.operators.contraction import contract_aliases, dense_renumber
from parrsb_spark.operators.periodic import match_periodic_faces

__all__ = [
    "pagerank",
    "personalized_pagerank",
    "hits",
    "kcore",
    "truss",
    "bfs_distances",
    "sssp",
    "connected_components",
    "strongly_connected_components",
    "bowtie_classes",
    "condensation_levels",
    "cc_bfs_single_seed",
    "triangle_counts",
    "clustering_coefficients",
    "triangle_total",
    "label_propagation",
    "modularity",
    "louvain_moves",
    "modularity_by_community",
    "random_walks",
    "link_prediction_scores",
    "degree_assortativity",
    "reciprocity",
    "anf_masks",
    "ball_estimates",
    "neighborhood_function",
    "effective_diameter",
    "harmonic_centrality_estimates",
    "fiedler",
    "rsb_partition",
    "rsb_resumable",
    "rsb_partition_two_level",
    "two_level_stats",
    "rcb_partition",
    "rib_partition",
    "partition_graph",
    "edge_cut",
    "comm_volume",
    "neighbor_census",
    "partition_sizes",
    "contract_aliases",
    "dense_renumber",
    "match_periodic_faces",
]
