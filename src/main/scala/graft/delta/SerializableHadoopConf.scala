package graft.delta

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships it to
  * executors via its `Writable` codec (the same trick Spark's own
  * datasources use) so distributed listing/deletion tasks can open a
  * `FileSystem` with the driver's credentials and settings.
  */
private[delta] class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
