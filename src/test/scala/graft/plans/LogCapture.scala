package graft.plans

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Shared log-capture for the rewrite-rule specs (preflight and
  * stand-down lines both ride log4j WARN): attaches one appender to the
  * named classes' loggers for the duration of `body`, restoring prior
  * levels after. One implementation — the per-spec copies this replaces
  * had already drifted in appender naming. */
object LogCapture {

  def capturing(classes: Class[_]*)(body: => Unit): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val appender = new AbstractAppender(
        s"graft-log-capture-${System.nanoTime()}",
        null, null, false, null) {
      override def append(e: LogEvent): Unit = buf.synchronized {
        buf += e.getMessage.getFormattedMessage
      }
    }
    appender.start()
    val loggers = classes.map(c => LogManager.getLogger(c.getName)
      .asInstanceOf[org.apache.logging.log4j.core.Logger])
    val priors = loggers.map(_.getLevel)
    loggers.foreach { l => l.addAppender(appender); l.setLevel(Level.WARN) }
    try body finally {
      loggers.zip(priors).foreach { case (l, p) =>
        l.removeAppender(appender); l.setLevel(p)
      }
      appender.stop()
    }
    buf.toSeq
  }
}
