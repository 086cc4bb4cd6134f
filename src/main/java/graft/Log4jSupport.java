package graft;

import org.apache.logging.log4j.Level;
import org.apache.logging.log4j.LogManager;
import org.apache.logging.log4j.core.LoggerContext;
import org.apache.logging.log4j.core.appender.FileAppender;
import org.apache.logging.log4j.core.config.Configuration;
import org.apache.logging.log4j.core.config.LoggerConfig;
import org.apache.logging.log4j.core.layout.PatternLayout;

/**
 * log4j2 programmatic configuration helper. Java, not Scala, because
 * log4j2's recursively-generic builders (B extends Builder&lt;B&gt;)
 * defeat scalac's type inference. Logic lives in {@link GraftLog}.
 */
public final class Log4jSupport {
  private Log4jSupport() {}

  /** Add a named logger with its own truncating file appender, own
   *  level, and additivity off (events never propagate across streams). */
  public static void addStream(String name, String path, Level level) {
    LoggerContext ctx = (LoggerContext) LogManager.getContext(false);
    Configuration config = ctx.getConfiguration();
    PatternLayout layout = PatternLayout.newBuilder()
        .withConfiguration(config)
        // the reference's asctime/levelname/message shape (config.py:35)
        .withPattern("%d{yyyy-MM-dd HH:mm:ss} %p %m%n")
        .build();
    FileAppender appender = FileAppender.newBuilder()
        .setConfiguration(config)
        .setName(name + "_file")
        .withFileName(path)
        .withAppend(false)
        .setLayout(layout)
        .build();
    appender.start();
    config.addAppender(appender);
    LoggerConfig lc = new LoggerConfig(name, level, false);
    lc.addAppender(appender, level, null);
    config.addLogger(name, lc);
    ctx.updateLoggers();
  }
}
