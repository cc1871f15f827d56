"""Near-duplicate pipeline: signatures → LSH → verified pairs → clusters.

North_rule flagship extension (SURVEY.md §3.4 lower half). Composition:

    code table ──map_batches(add_identity)──┐
                                            ├─ SignatureStage actor pool
                                            │  (MinHash K perms + SimHash)
                  explode band rows ────────┤   [stateless, vectorized]
                  groupby(band, band_hash) ─┤   [THE skewed shuffle: capped]
                  distinct pairs ───────────┤
                  verify (2 hash joins) ────┤
                  connected components ─────┘   [iterative groupby-min]

Returns lazy Datasets for signatures, candidate/verified pairs and
cluster labels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

from duplicate_finder_ray.config import PipelineConfig
from duplicate_finder_ray.stages import cc, neardup
from duplicate_finder_ray.stages.derive import add_identity


@dataclass
class NearDupResult:
    signatures: ray.data.Dataset   # file_id, minhash, simhash, n_shingles
    #: a, b, n_bands, jaccard, n_inter, n_union — exact Jaccard plus the
    #: integer set sizes in verify_mode="exact"; MinHash estimate (and
    #: -1 sentinels for the sizes) in "estimate" mode
    pairs: ray.data.Dataset
    labels: ray.data.Dataset       # file_id, component
    metrics: dict = field(default_factory=dict)

    def clusters(self) -> ray.data.Dataset:
        return cc.clusters_table(self.labels)


class NearDupPipeline:
    def __init__(self, cfg: PipelineConfig | None = None) -> None:
        self.cfg = cfg or PipelineConfig()

    def signatures_for(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """(repo,path,commit,lang,content) → signature table. Content is
        dropped inside the actor stage; only (file_id, sigs) flow on."""
        ds = ds.map_batches(add_identity, batch_format="pyarrow")
        ds = ds.select_columns(["file_id", "content"])
        return neardup.signatures(ds, self.cfg)

    def run_on(self, ds: ray.data.Dataset) -> NearDupResult:
        cfg = self.cfg
        with_id = ds.map_batches(add_identity, batch_format="pyarrow")
        # exact mode carries the shingle sets through the signature pass
        # so verification never re-reads or re-shingles content
        sigs = neardup.signatures(
            with_id.select_columns(["file_id", "content"]),
            cfg,
            emit_shingles=(cfg.verify_mode == "exact"),
        ).materialize()  # reused: bands + verify endpoint lookups
        # overlap the verify shard split under candidate generation
        # (round-4 VERDICT item 2); only worth launching when the
        # sharded verify path is certain (endpoints can approach the
        # corpus, which already exceeds the broadcast limit)
        prestarted = None
        if (
            cfg.verify_mode == "exact"
            and cfg.verify_prestart_shards
            and sigs.count() > cfg.broadcast_verify_limit
        ):
            prestarted = neardup.prestart_verify_split(sigs, cfg)
        band_rows = neardup.explode_bands(sigs, cfg)
        # sigs_source lets candidate_pairs fuse the band explosion into
        # the exchange split tasks at scale (band_rows stays lazy and
        # is never materialized as an intermediate on that path)
        candidates = neardup.candidate_pairs(band_rows, cfg, sigs_source=sigs)
        if cfg.verify_mode == "exact":
            verified = neardup.verify_pairs_exact(
                candidates.materialize(), sigs, cfg, prestarted=prestarted
            ).materialize()
        else:
            verified = neardup.verify_pairs(candidates, sigs, cfg).materialize()
        cc_rounds: list[dict] = []
        labels = cc.connected_components(verified, cfg, round_metrics=cc_rounds)
        return NearDupResult(
            signatures=sigs,
            pairs=verified,
            labels=labels,
            metrics={"cc_rounds": cc_rounds},
        )

    def run_checkpointed(
        self,
        ds: ray.data.Dataset,
        checkpoint_root: str,
        resume: bool = True,
    ) -> NearDupResult:
        """Checkpointed/resumable run (north_rule M7): every shuffle-
        stage boundary (signatures → candidate pairs → verified pairs →
        labels) commits partitioned Parquet + a lineage manifest; a
        rerun with the same config resumes from the last completed
        boundary instead of recomputing (the reference restarts from
        zero — SURVEY.md §4.1 'Checkpoint / resume: none')."""
        from duplicate_finder_ray.state.checkpoint import CheckpointManager

        cfg = self.cfg
        mgr = CheckpointManager(checkpoint_root, cfg)
        with_id = ds.map_batches(add_identity, batch_format="pyarrow")

        sigs = mgr.run_stage(
            "signatures",
            lambda: neardup.signatures(
                with_id.select_columns(["file_id", "content"]),
                cfg,
                emit_shingles=(cfg.verify_mode == "exact"),
            ),
            resume=resume,
        )
        candidates = mgr.run_stage(
            "candidates",
            lambda: neardup.candidate_pairs(neardup.explode_bands(sigs, cfg), cfg),
            resume=resume,
        )
        if cfg.verify_mode == "exact":
            verified = mgr.run_stage(
                "verified",
                lambda: neardup.verify_pairs_exact(candidates, sigs, cfg),
                resume=resume,
            )
        else:
            verified = mgr.run_stage(
                "verified",
                lambda: neardup.verify_pairs(candidates, sigs, cfg),
                resume=resume,
            )
        cc_rounds: list[dict] = []
        labels = mgr.run_stage(
            "labels",
            lambda: cc.connected_components(verified, cfg, round_metrics=cc_rounds),
            resume=resume,
            # persisted into the labels stage's lineage manifest: the
            # per-round O(max-component) bucket-load guard (empty list
            # when the stage was resumed from a checkpoint or took the
            # single-task small-graph path)
            extra=lambda: {"cc_rounds": cc_rounds},
        )
        metrics = {
            "checkpoints": mgr.manifests(),
            "config_hash": mgr.cfg_hash,
            "cc_rounds": cc_rounds,
        }
        return NearDupResult(
            signatures=sigs, pairs=verified, labels=labels, metrics=metrics
        )
