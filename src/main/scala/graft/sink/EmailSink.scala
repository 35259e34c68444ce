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
