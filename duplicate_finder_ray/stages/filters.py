"""Row filters: size range + include/exclude globs (stateless, vectorized).

Semantics conform to the reference
(/root/reference/duplicate_finder/duplicate_finder.py:143-164):

* size bounds use TRUTHY gating — a bound of 0 or None disables the
  check (``if min_size and size < min_size``), so ``min_size=0`` keeps
  empty files;
* include globs first (no patterns ⇒ keep all), then exclude globs drop;
  matching is fnmatch over the POSIX path — here over ``repo + "/" +
  path`` since table rows have no filesystem root.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.functions.globs import include_exclude_mask


def make_size_filter(min_size: int | None, max_size: int | None):
    """Vectorized size-range predicate with the reference's truthiness
    semantics (falsy bound ⇒ disabled)."""

    def size_filter(batch: pa.Table) -> pa.Table:
        mask = None
        if min_size:
            mask = pc.greater_equal(batch["size"], pa.scalar(min_size, pa.int64()))
        if max_size:
            hi = pc.less_equal(batch["size"], pa.scalar(max_size, pa.int64()))
            mask = hi if mask is None else pc.and_(mask, hi)
        return batch if mask is None else batch.filter(mask)

    return size_filter


def make_glob_filter(cfg: PipelineConfig):
    """Vectorized include/exclude filter over ``repo + "/" + path``."""
    include_regex, exclude_regex = cfg.include_regex, cfg.exclude_regex

    def glob_filter(batch: pa.Table) -> pa.Table:
        if include_regex is None and exclude_regex is None:
            return batch
        full_path = pc.binary_join_element_wise(batch["repo"], batch["path"], "/")
        return batch.filter(include_exclude_mask(full_path, include_regex, exclude_regex))

    return glob_filter
