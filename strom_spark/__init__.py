"""strom_spark — a PySpark-native engine with the capabilities of the
reference stream-component library (antonmi/Strom), re-expressed
Spark-first.

Core object: a ``Flow`` (named registry of lazy DataFrames).  Components
are pure ``Flow -> Flow`` rewriters; a ``Pipeline`` composes them and is
itself a component.  All compute lowers to DataFrame/SQL plans so
Catalyst/Tungsten/AQE handle optimization and physical execution.
"""

from .cache import release_caches
from .flow import Flow, as_flow
from .component import Component, Pipeline
from .planprobe import capture_bounded_broadcasts, capture_loop_plans
from .session import get_spark, use_state_store
from .io import load_table, load_flow, spread, TABLES
from .scale import compact_write, detect_hot_keys, salted_join, write_bucketed, zorder_key
from .sources.source import IOGets, Source, SourceOrigin, Read, ReadLines, ReadStream
from .sources.sink import Sink, SinkOrigin, Write, Console, Null, Memory
from .operators.transformer import (
    Transformer,
    Map,
    Filter,
    FlatMap,
    PandasMap,
    SQL,
    Agg,
    Join,
)
from .operators.mixer import Mixer, MixerTree
from .operators.splitter import Splitter, SplitterTree, Repartition
from .operators.renamer import Renamer
from .operators.stateful import StatefulTransformer
from .operators.windows import CountWindow, SlidingCountWindow, TimeWindow, SessionWindow
from .operators.relational import HeavyHitters, Sort, Limit, Distinct, TopK, TopKPerGroup, RowNumber, SetOp, Quantiles, global_row_number, ProfileColumns
from .operators.loop import Iterate
from .operators.cep import MatchDecide
from .operators.dedup import (
    Decontaminate,
    LineDedup,
    SubstringDedup,
    PhraseBlocklist,
    SimHashDedup,
    ExactDedup,
    StreamingExactDedup,
    WinnowFingerprints,
    NgramJaccardPairs,
    MinHashLSHPairs,
    MinHashDedup,
    SimHash,
    SimHashPairs,
    EmbeddingNearDupPairs,
    SemDeDup,
)
from .operators.similarity import CosineTopK, CosineLSHJoin, IVFTopK, IVFIndex, RRFFusion, MMRRerank, ScalarQuantize, CoOccurrenceJaccard, GramMatrix, ivf_search
from .operators.sketch import BloomFilter, CountMinSketch, bloom_contains, cms_estimate
from .operators.asof import AsofJoin
from .operators.rangejoin import RangeJoin
from .operators.textrank import (
    BM25Score,
    DSIRWeights,
    SliceDivergence,
    StupidBackoffLM,
    TfIdfTopTerms,
    UnigramLMScore,
)
from .operators.graph import ConnectedComponents, NeighborMeanFeatures, PageRank, TriangleCount
from .operators.sampling import GroupCap, HashSample, HashSplit, MixtureSample, TemperatureMix
from .operators.packing import ChunkDocuments, PackSequences
from .operators.fuzzy import EditDistanceJoin
from .operators.clustering import LloydKMeans
from .operators.multimodal import (
    FrameSample,
    ImagePHash,
    PHashNearDupPairs,
    MediaFeatures,
    MediaResize,
    bmp_decode,
    bmp_phash,
    bmp_synth,
    ppm_decode,
    ppm_parse,
    ppm_resize,
    synthetic_assets,
    wav_decode,
    wav_synth,
    y4m_frames,
    y4m_parse,
    y4m_synth,
)

__all__ = [
    "release_caches",
    "Flow",
    "as_flow",
    "Component",
    "Pipeline",
    "capture_bounded_broadcasts",
    "capture_loop_plans",
    "get_spark",
    "use_state_store",
    "IOGets",
    "Source",
    "SourceOrigin",
    "Read",
    "ReadLines",
    "ReadStream",
    "Sink",
    "SinkOrigin",
    "Write",
    "Console",
    "Null",
    "Memory",
    "Transformer",
    "Map",
    "Filter",
    "FlatMap",
    "PandasMap",
    "SQL",
    "Agg",
    "Join",
    "Mixer",
    "MixerTree",
    "Splitter",
    "SplitterTree",
    "Repartition",
    "Renamer",
    "StatefulTransformer",
    "CountWindow",
    "SlidingCountWindow",
    "TimeWindow",
    "SessionWindow",
    "Sort",
    "Limit",
    "Distinct",
    "TopK",
    "TopKPerGroup",
    "RowNumber",
    "global_row_number",
    "SetOp",
    "Iterate",
    "MatchDecide",
    "ExactDedup",
    "Decontaminate",
    "LineDedup",
    "SubstringDedup",
    "PhraseBlocklist",
    "StreamingExactDedup",
    "WinnowFingerprints",
    "SimHashDedup",
    "NgramJaccardPairs",
    "MinHashLSHPairs",
    "MinHashDedup",
    "SimHash",
    "SimHashPairs",
    "EmbeddingNearDupPairs",
    "SemDeDup",
    "CosineTopK",
    "RRFFusion",
    "MMRRerank",
    "ScalarQuantize",
    "CoOccurrenceJaccard",
    "GramMatrix",
    "BloomFilter",
    "CountMinSketch",
    "bloom_contains",
    "cms_estimate",
    "CosineLSHJoin",
    "IVFTopK",
    "IVFIndex",
    "ivf_search",
    "AsofJoin",
    "RangeJoin",
    "BM25Score",
    "DSIRWeights",
    "StupidBackoffLM",
    "TfIdfTopTerms",
    "UnigramLMScore",
    "SliceDivergence",
    "PackSequences",
    "ChunkDocuments",
    "EditDistanceJoin",
    "LloydKMeans",
    "ConnectedComponents",
    "PageRank",
    "TriangleCount",
    "NeighborMeanFeatures",
    "Quantiles",
    "HeavyHitters",
    "ProfileColumns",
    "GroupCap",
    "HashSample",
    "HashSplit",
    "MixtureSample",
    "TemperatureMix",
    "compact_write",
    "zorder_key",
    "salted_join",
    "detect_hot_keys",
    "write_bucketed",
    "MediaFeatures",
    "ImagePHash",
    "PHashNearDupPairs",
    "bmp_phash",
    "MediaResize",
    "FrameSample",
    "ppm_resize",
    "ppm_parse",
    "synthetic_assets",
    "wav_decode",
    "wav_synth",
    "bmp_decode",
    "bmp_synth",
    "y4m_parse",
    "y4m_frames",
    "y4m_synth",
    "ppm_decode",
]

__version__ = "0.1.0"
