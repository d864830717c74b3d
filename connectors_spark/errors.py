"""Concurrency / protocol exceptions (reference: OptimisticTransactionImpl +
ConflictChecker error surface)."""

from __future__ import annotations


class DeltaError(Exception):
    pass


class ConcurrentModificationException(DeltaError):
    pass


class ProtocolChangedException(ConcurrentModificationException):
    """Winning commit changed the protocol (ConflictChecker.scala:120-129)."""


class MetadataChangedException(ConcurrentModificationException):
    """Winning commit changed table metadata (ConflictChecker.scala:134-142)."""


class ConcurrentAppendException(ConcurrentModificationException):
    """Files were added that should have been read by this transaction
    (ConflictChecker.scala:148-173)."""


class ConcurrentDeleteReadException(ConcurrentModificationException):
    """This transaction read a file deleted by a winning commit
    (ConflictChecker.scala:179-198)."""


class ConcurrentDeleteDeleteException(ConcurrentModificationException):
    """Both transactions deleted the same file (ConflictChecker.scala:204-216)."""


class ConcurrentTransactionException(ConcurrentModificationException):
    """Overlapping idempotent-txn appIds (ConflictChecker.scala:222-232)."""


class DeltaProtocolError(DeltaError):
    pass


class DeltaConcurrentCommitFailure(DeltaError):
    pass
