package graft.errors

/** Typed error taxonomy, cf. reference `pipelines/errors.py:1-25`
  * (SURVEY.md §2.9 E1). Row-level errors additionally surface as
  * `_error_code` quarantine columns in the pipelines; these exceptions
  * are for source/connection-level failures.
  */
sealed abstract class PipelineError(val code: String, message: String)
    extends RuntimeException(s"[$code] $message")

final case class DataConflictError(message: String)
    extends PipelineError("E001", message)
final case class AuthorizationError(message: String)
    extends PipelineError("E002", message)
final case class InvalidFormatError(message: String)
    extends PipelineError("E003", message)
final case class DatabaseConnectionError(message: String)
    extends PipelineError("E004", message)
final case class SheetReadError(message: String)
    extends PipelineError("E005", message)
