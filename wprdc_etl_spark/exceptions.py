"""Error model.

Descends from the reference's exception set (SURVEY.md §2.5):

- ``pipeline/exceptions.py::InvalidConfigException`` — bad/missing settings.
- ``pipeline/exceptions.py::DuplicateFileException`` — input checksum equals
  the last successful run's (``pipeline/pipeline.py::Pipeline.run``). In the
  engine a duplicate *batch* is a silent idempotent skip (logged in lineage),
  but ``DuplicateBatchException`` is kept for callers who opt into strict
  mode (``IngestJob(strict_duplicate_check=True)``).
- plain ``RuntimeError`` for an incomplete pipeline
  (``pipeline/pipeline.py::Pipeline.enforce_full_pipeline``) — here a typed
  ``IncompletePipelineError`` subclassing RuntimeError for parity.
- ``IsHeaderException`` (``pipeline/extractors.py::CSVExtractor.handle_line``)
  — repeated header rows are filtered declaratively by the CSV source, but
  the name is kept for the fixture-level extractor tests.
"""

from __future__ import annotations


class InvalidConfigException(Exception):
    """Engine/job configuration is missing or inconsistent."""


class IncompletePipelineError(RuntimeError):
    """A job was started without all required stages configured.

    Parity: ``pipeline/pipeline.py::Pipeline.enforce_full_pipeline`` raises
    plain ``RuntimeError`` when any of connector/extractor/schema/loader is
    unset.
    """


class DuplicateBatchException(Exception):
    """A batch with this (job, batch_id) was already committed.

    Parity: ``pipeline/exceptions.py::DuplicateFileException`` — raised by
    ``Pipeline.run`` when the input checksum matches the last successful
    run. Default engine behavior is an idempotent skip; strict mode raises.
    """


class IsHeaderException(Exception):
    """A repeated header row was seen mid-stream.

    Parity: ``pipeline/extractors.py::CSVExtractor.handle_line``.
    """


class SinkCommitError(RuntimeError):
    """The sink failed to commit a batch (no partial state was published).

    Parity: ``pipeline/loaders.py::CKANDatastoreLoader.load`` raising
    ``RuntimeError`` on 4xx/5xx upsert/metadata status codes.
    """
