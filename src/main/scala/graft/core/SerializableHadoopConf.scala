package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** A Java-serializable carrier for a Hadoop [[Configuration]] (which is
  * a Writable, not Serializable) — lets executor-side filesystem writers
  * resolve `FileSystem.get` with the SESSION configuration
  * (`spark.hadoop.*` credentials, fs impls) instead of a bare classpath
  * default. Broadcast it once per job; `.value` inside the task.
  */
class SerializableHadoopConf(@transient var value: Configuration)
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
