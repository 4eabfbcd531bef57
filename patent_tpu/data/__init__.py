"""Host-side ETL: corpus schema, graph build, training-pair prep, splits."""

from .schema import (  # noqa: F401
    FigureRecord,
    cpc_levels,
    parse_figure_name,
    records_from_metadata,
)
from .graph_build import (  # noqa: F401
    HeteroGraph,
    build_feature_matrix,
    build_hetero_graph,
    load_graph,
)
from .prep import TrainingData, figure_pair_maps, prepare_training_data  # noqa: F401
from .ground_truth import (  # noqa: F401
    build_ground_truth,
    figure_to_pos_figures,
    save_ground_truth,
    split_query_gallery,
)
from .pairs import (  # noqa: F401
    connection_level,
    load_figure_pair_connections,
    sample_figure_pairs,
    save_figure_pair_connections,
)
from .bpe import ClipBPETokenizer, load_clip_bpe  # noqa: F401
from . import synthetic  # noqa: F401
