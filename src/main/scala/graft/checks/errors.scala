package graft.checks

/** Error surface mirroring the reference's public exception classes
  * (reference df_to_azure/exceptions.py:1-42). Only the engine-relevant
  * ones are kept: ADF/driver-provisioning errors (CreateContainerError,
  * EnvVariableNotSetError, PipelineRunError, DriverError) collapse into
  * plain IllegalStateException because Spark has no ADF control plane and
  * JDBC needs no odbc-driver sniffing (SURVEY.md §2 O19-O21).
  */
final case class WrongDtypeError(message: String) extends RuntimeException(message)
final case class DoubleColumnNamesError(message: String) extends RuntimeException(message)
final case class UpsertError(message: String) extends RuntimeException(message)
final case class CreateSchemaError(message: String) extends RuntimeException(message)
final case class UnknownDtypeError(message: String) extends RuntimeException(message)
