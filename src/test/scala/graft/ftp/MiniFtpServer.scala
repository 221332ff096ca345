package graft.ftp

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicBoolean

import scala.util.control.NonFatal

/** In-process FTP server for specs: serves one local directory over
  * RFC 959 + MLSD, passive mode only, loopback only. Protocol support
  * mirrors exactly what [[graft.sources.ftp.FtpClient]] speaks.
  */
class MiniFtpServer(root: Path, requiredPassword: Option[String] = None) {
  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  private val running = new AtomicBoolean(true)
  val port: Int = server.getLocalPort

  /** REST commands served — lets specs assert a client actually used
    * the restart path instead of skip-reading.
    */
  val restCount = new java.util.concurrent.atomic.AtomicLong(0)

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case NonFatal(_) => () }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running.set(false); server.close() }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(
      sock.getInputStream, StandardCharsets.UTF_8))
    val out = sock.getOutputStream
    def reply(s: String): Unit = {
      out.write((s + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
    }
    var cwd = "/"
    var dataServer: ServerSocket = null
    var renameFrom: Option[Path] = None
    var restOffset = 0L // set by REST, consumed by the next RETR/STOR

    def resolve(p: String): Path = {
      val virtual =
        if (p.startsWith("/")) p
        else if (cwd == "/") s"/$p"
        else s"$cwd/$p"
      val norm = Paths.get(virtual).normalize().toString
      root.resolve(norm.stripPrefix("/")).normalize()
    }

    def openData(): Socket = {
      val d = dataServer.accept()
      d
    }

    def mdtm(p: Path): String = {
      val f = new java.text.SimpleDateFormat("yyyyMMddHHmmss")
      f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      f.format(new java.util.Date(Files.getLastModifiedTime(p).toMillis))
    }

    reply("220 graft MiniFtpServer ready")
    try {
      var line = in.readLine()
      while (line != null) {
        val sp = line.indexOf(' ')
        val (c, arg) =
          if (sp < 0) (line.toUpperCase, "")
          else (line.take(sp).toUpperCase, line.drop(sp + 1))
        c match {
          case "USER" => reply("331 password required")
          case "PASS" =>
            if (requiredPassword.forall(_ == arg)) reply("230 logged in")
            else reply("530 Login incorrect")
          case "SYST" => reply("215 UNIX Type: L8")
          case "FEAT" =>
            reply("211-Features:"); reply(" MLSD"); reply(" REST STREAM")
            reply("211 End")
          case "TYPE" => reply("200 ok")
          case "NOOP" => reply("200 ok")
          case "PWD" => reply(s"""257 "$cwd" is cwd""")
          case "CWD" =>
            val t = resolve(arg)
            if (Files.isDirectory(t)) {
              cwd = "/" + root.relativize(t).toString.replace('\\', '/')
              if (cwd == "/.") cwd = "/"
              cwd = if (cwd == "/") "/" else cwd.stripSuffix("/")
              reply("250 ok")
            } else reply("550 not a directory")
          case "CDUP" =>
            cwd = Option(Paths.get(cwd).getParent).map(_.toString).getOrElse("/")
            reply("250 ok")
          case "PASV" =>
            if (dataServer != null) dataServer.close()
            dataServer = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            val p = dataServer.getLocalPort
            reply(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
          case "REST" =>
            arg.toLongOption match {
              case Some(off) if off >= 0 =>
                restOffset = off
                restCount.incrementAndGet()
                reply(s"350 restarting at $off")
              case _ => reply("501 bad restart offset")
            }
          case "RETR" =>
            val t = resolve(arg)
            val off = restOffset; restOffset = 0L
            if (!Files.isRegularFile(t)) reply("550 no such file")
            else {
              reply("150 opening data connection")
              val d = openData()
              // a client that aborts mid-download (REST-reopen seeks do
              // this) breaks the data pipe — a real server replies 426
              // and keeps the control session; dying here would kill
              // every later command on this connection
              val completed =
                try {
                  val in = Files.newInputStream(t)
                  try {
                    var toSkip = off
                    while (toSkip > 0) {
                      val n = in.skip(toSkip)
                      if (n <= 0) toSkip = 0 else toSkip -= n
                    }
                    in.transferTo(d.getOutputStream)
                    true
                  } finally in.close()
                } catch { case NonFatal(_) => false }
                finally d.close()
              if (completed) reply("226 transfer complete")
              else reply("426 transfer aborted")
            }
          case "STOR" =>
            val t = resolve(arg)
            val off = restOffset; restOffset = 0L
            reply("150 ok to send data")
            val d = openData()
            try {
              Files.createDirectories(t.getParent)
              if (off == 0)
                Files.copy(d.getInputStream, t, StandardCopyOption.REPLACE_EXISTING)
              else {
                val raf = new java.io.RandomAccessFile(t.toFile, "rw")
                try {
                  raf.seek(off)
                  val buf = new Array[Byte](65536)
                  val in = d.getInputStream
                  var n = in.read(buf)
                  while (n >= 0) { raf.write(buf, 0, n); n = in.read(buf) }
                  raf.setLength(raf.getFilePointer) // truncate stale tail
                } finally raf.close()
              }
            } finally d.close()
            reply("226 transfer complete")
          case "NLST" =>
            val t = resolve(arg)
            if (!Files.isDirectory(t)) reply("550 not a directory")
            else {
              reply("150 here comes the listing")
              val d = openData()
              val w: OutputStream = d.getOutputStream
              Files.list(t).forEach { p =>
                val prefix = if (arg.isEmpty) "" else arg.stripSuffix("/") + "/"
                w.write((prefix + p.getFileName + "\r\n")
                  .getBytes(StandardCharsets.UTF_8))
              }
              w.flush(); d.close()
              reply("226 done")
            }
          case "MLSD" =>
            val t = resolve(arg)
            if (!Files.isDirectory(t)) reply("550 not a directory")
            else {
              reply("150 listing")
              val d = openData()
              val w = d.getOutputStream
              Files.list(t).forEach { p =>
                val typ = if (Files.isDirectory(p)) "dir" else "file"
                val size = if (Files.isRegularFile(p)) Files.size(p) else 0L
                w.write((s"type=$typ;size=$size;modify=${mdtm(p)}; ${p.getFileName}\r\n")
                  .getBytes(StandardCharsets.UTF_8))
              }
              w.flush(); d.close()
              reply("226 done")
            }
          case "SIZE" =>
            val t = resolve(arg)
            if (Files.isRegularFile(t)) reply(s"213 ${Files.size(t)}")
            else reply("550 not a file")
          case "DELE" =>
            val t = resolve(arg)
            if (Files.isRegularFile(t) && Files.deleteIfExists(t)) reply("250 deleted")
            else reply("550 delete failed")
          case "RMD" =>
            val t = resolve(arg)
            if (Files.isDirectory(t) && Files.deleteIfExists(t)) reply("250 removed")
            else reply("550 rmd failed")
          case "MKD" =>
            val t = resolve(arg)
            try { Files.createDirectories(t); reply(s"""257 "$arg" created""") }
            catch { case NonFatal(_) => reply("550 mkd failed") }
          case "RNFR" =>
            val t = resolve(arg)
            if (Files.exists(t)) { renameFrom = Some(t); reply("350 ready") }
            else reply("550 no such file")
          case "RNTO" =>
            renameFrom match {
              case Some(src) =>
                val t = resolve(arg)
                try {
                  Files.createDirectories(t.getParent)
                  Files.move(src, t, StandardCopyOption.REPLACE_EXISTING)
                  reply("250 renamed")
                } catch { case NonFatal(_) => reply("550 rename failed") }
                renameFrom = None
              case None => reply("503 RNFR first")
            }
          case "QUIT" => reply("221 bye"); sock.close(); return
          case _ => reply(s"502 $c not implemented")
        }
        line = in.readLine()
      }
    } catch { case NonFatal(_) => () }
    finally {
      if (dataServer != null) dataServer.close()
      try sock.close() catch { case NonFatal(_) => () }
    }
  }
}
