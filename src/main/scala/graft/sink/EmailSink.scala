package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

/** K3 — email sink (reference utils/email.py:8-62, wired
  * triage.py:265-276): send the CSV rendering as an attachment.
  *
  * The engine builds a complete RFC 5322 / MIME multipart message; the
  * transport is pluggable because this environment has no SMTP library
  * and no egress. `FileTransport` (default) writes the .eml next to the
  * output — a real deployment plugs an SMTP transport with the same
  * interface.
  */
object EmailSink {

  trait Transport {
    def send(server: String, port: Int, from: String, to: String, message: String): Unit
  }

  final class FileTransport(dir: String) extends Transport {
    override def send(server: String, port: Int, from: String, to: String, message: String): Unit = {
      Files.createDirectories(Paths.get(dir))
      val safe = to.replaceAll("[^A-Za-z0-9._-]", "_")
      Files.write(Paths.get(dir, s"$safe.eml"), message.getBytes(StandardCharsets.UTF_8))
    }
  }

  /** Raw-socket SMTP transport — the production path behind the same
    * trait, with the reference's `smtplib.SMTP(...).sendmail` semantics
    * (reference utils/email.py:55-59: plain SMTP, no auth, no TLS):
    * 220 greeting, EHLO, MAIL FROM, one RCPT TO per comma-separated
    * recipient, dot-stuffed CRLF DATA, QUIT. Multiline replies
    * (`250-...`) are drained; any unexpected code fails with the
    * server's text. FileTransport stays the CLI default in this
    * zero-egress sandbox; EmailSinkSpec exercises this class against an
    * in-process mock server.
    */
  final class SmtpTransport(timeoutMs: Int = 30000) extends Transport {
    override def send(server: String, port: Int, from: String, to: String, message: String): Unit = {
      val socket = new java.net.Socket()
      try {
        socket.connect(new java.net.InetSocketAddress(server, port), timeoutMs)
        socket.setSoTimeout(timeoutMs)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(socket.getInputStream, StandardCharsets.US_ASCII))
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(socket.getOutputStream, StandardCharsets.US_ASCII))

        def reply(): (Int, String) = {
          val sb = new StringBuilder
          var line = in.readLine()
          if (line == null) throw new java.io.IOException("SMTP: connection closed mid-reply")
          sb.append(line)
          while (line.length >= 4 && line.charAt(3) == '-') {
            line = in.readLine()
            if (line == null) throw new java.io.IOException("SMTP: connection closed mid-reply")
            sb.append('\n').append(line)
          }
          val code = line.take(3)
          require(code.forall(_.isDigit), s"SMTP: malformed reply: $line")
          (code.toInt, sb.toString)
        }
        def cmd(c: String, expect: Int*): Unit = {
          out.write(c); out.write("\r\n"); out.flush()
          val (code, text) = reply()
          if (!expect.contains(code))
            throw new java.io.IOException(s"SMTP: '$c' rejected: $text")
        }

        val (greet, greetText) = reply()
        if (greet != 220) throw new java.io.IOException(s"SMTP: bad greeting: $greetText")
        val helo = scala.util.Try(java.net.InetAddress.getLocalHost.getHostName)
          .getOrElse("localhost")
        cmd(s"EHLO $helo", 250)
        cmd(s"MAIL FROM:<$from>", 250)
        val rcpts = to.split(",").map(_.trim).filter(_.nonEmpty)
        require(rcpts.nonEmpty, "SMTP: no recipients")
        rcpts.foreach(r => cmd(s"RCPT TO:<$r>", 250, 251))
        cmd("DATA", 354)
        // normalize to CRLF, dot-stuff (RFC 5321 §4.5.2), terminate
        val normalized = message.replace("\r\n", "\n").replace("\n", "\r\n")
        val stuffed = normalized.split("\r\n", -1)
          .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
        out.write(stuffed)
        if (!stuffed.endsWith("\r\n")) out.write("\r\n")
        out.write(".\r\n"); out.flush()
        val (dcode, dtext) = reply()
        if (dcode != 250) throw new java.io.IOException(s"SMTP: message rejected: $dtext")
        // the 250 above IS the success boundary: the server has accepted
        // responsibility for the message. A QUIT hiccup (non-221, or an
        // MTA that closes the socket right after accepting) must not
        // report failure for a delivered email — a retry would duplicate it.
        try cmd("QUIT", 221)
        catch { case _: Exception => () }
      } finally socket.close()
    }
  }

  /** Build the MIME message (multipart/mixed: text body + base64 csv
    * attachment named results.csv, like the reference).
    */
  def buildMessage(from: String, to: String, subject: String, body: String,
      csvContent: String, attachmentName: String = "results.csv"): String = {
    val boundary = "----graft-boundary-0000"
    val b64 = Base64.getMimeEncoder(76, "\r\n".getBytes)
      .encodeToString(csvContent.getBytes(StandardCharsets.UTF_8))
    s"""From: $from\r
       |To: $to\r
       |Subject: $subject\r
       |MIME-Version: 1.0\r
       |Content-Type: multipart/mixed; boundary="$boundary"\r
       |\r
       |--$boundary\r
       |Content-Type: text/plain; charset=utf-8\r
       |\r
       |$body\r
       |--$boundary\r
       |Content-Type: text/csv; name="$attachmentName"\r
       |Content-Transfer-Encoding: base64\r
       |Content-Disposition: attachment; filename="$attachmentName"\r
       |\r
       |$b64\r
       |--$boundary--\r
       |""".stripMargin
  }

  def send(transport: Transport, server: String, port: Int, from: String,
      to: String, subject: String, body: String, csvContent: String): Unit =
    transport.send(server, port, from, to,
      buildMessage(from, to, subject, body, csvContent))
}
