"""tilers_tools_ray — a from-scratch, Ray-Data-native raster tiling +
spatial-join engine with the query/data-processing capabilities of the
public ``vss-devel/tilers-tools`` toolchain (gdal_tiler pyramid cutting,
map2gdal georeferencing, tiles_merge / tiles_convert tile-set
transforms), rebuilt as ``ray.data.Dataset`` pipelines.

Reference provenance: the snapshot at /root/reference/ is empty (see
SURVEY.md §0); behavior parity is asserted against the public upstream
semantics via this repo's single-process golden tiler (``golden.py``).

Layout (SURVEY.md §7.3):
  tilegrid.py   — tile pyramid math (Mercator/geodetic), tile_key codec
  codecs.py     — raw / png / dct image codecs + perceptual hash
  geometry.py   — affine solve, polygon fill, PIP, quadtree cells, kNN
  raster.py     — shared warp-cut / composite / downsample pixel kernels
  corpus.py     — deterministic synthetic image+caption corpus
  golden.py     — single-process reference tiler (conformance target)
  stages/       — Ray Data map_batches stages (decode, fragment, join…)
  pipelines/    — end-to-end Dataset pipelines (pyramid, merge, convert)
  relational/   — generic relational ops (joins, aggs, dedup, ANN, text)
  state/        — lineage manifest, checkpoint/resume
"""

__version__ = "0.1.0"
