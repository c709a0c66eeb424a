package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** External-process / function map over line streams — the reference's
  * `bwa mem` stage (`program/src/main/scala/hmushtaq/sparkga1/
  * SparkGA1.scala:63-217`, exec at 128-143: spawn a process per chunk,
  * stream stdout line-by-line into the parser).
  *
  * Spark-native: the unit of work is a partition, not a sideband file.
  * `mapLines` runs a pure-Scala `Iterator[String] => Iterator[String]`
  * per partition (zero process overhead — preferred); `processPipe`
  * spawns one external process per partition and streams stdin/stdout
  * concurrently (the `RDD.pipe` shape on Datasets, for genuinely external
  * tools). Both keep data on executors — no driver round-trip, no HDFS
  * sideband files, and downstream operators consume the lines as a
  * regular Dataset so Catalyst keeps optimizing past the pipe.
  */
object Pipe {

  /** Pure-Scala line transform per partition (the fast path: same shape
    * as an external tool, no process).
    */
  def mapLines(ds: Dataset[String],
               f: Iterator[String] => Iterator[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(f)
  }

  /** Stream each partition through an external command, one process per
    * partition: a writer thread feeds stdin while the task thread
    * consumes stdout (no deadlock on large outputs, no full
    * materialization).
    */
  def processPipe(ds: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { lines =>
      if (!lines.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(false)
        val proc = pb.start()
        // a consumer that stops early (e.g. limit() never exhausts the
        // iterator) would otherwise leak the process + its drain threads;
        // task completion is the one hook that always fires.
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (proc.isAlive) proc.destroyForcibly()
          ()
        }
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(proc.getOutputStream)
          try lines.foreach(out.println) finally out.close()
        })
        writer.setDaemon(true)
        writer.start()
        // drain stderr on its own thread: a chatty tool would otherwise
        // fill the ~64KB pipe buffer, block, and deadlock the task.
        // Captured (bounded) so a failure can surface it.
        val errBuf = new java.lang.StringBuilder
        val errDrain = new Thread(() => {
          val src = scala.io.Source.fromInputStream(proc.getErrorStream)
          try src.getLines().foreach { l =>
            if (errBuf.length < 8192) errBuf.append(l).append('\n')
          } finally src.close()
        })
        errDrain.setDaemon(true)
        errDrain.start()
        val out = scala.io.Source.fromInputStream(proc.getInputStream)
          .getLines()
        // surface non-zero exit AFTER stdout drains — a tool that dies
        // mid-stream must fail the task, not silently truncate the data.
        new Iterator[String] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) {
              val code = proc.waitFor()
              // join the drain thread before reading its buffer — the
              // happens-before edge that makes errBuf safe to read here
              errDrain.join(10000)
              if (code != 0) throw new RuntimeException(
                s"piped command ${cmd.mkString(" ")} exited $code; " +
                  s"stderr: ${errBuf.toString.take(2048)}")
            }
            h
          }
          def next(): String = out.next()
        }
      }
    }
  }
}
