package graft.sink

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** SmtpTransport against an in-process mock SMTP server: the full
  * protocol conversation (greeting, EHLO with a multiline reply, MAIL,
  * per-recipient RCPT, dot-stuffed DATA, QUIT) plus the rejection
  * path. Loopback sockets only — no egress.
  */
class EmailSinkSpec extends AnyFunSuite {

  /** One-connection mock server. Records commands and the DATA payload;
    * optionally rejects RCPT.
    */
  private final class MockSmtp(rejectRcpt: Boolean) extends Thread {
    private val server = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    val commands: mutable.Buffer[String] = mutable.Buffer.empty
    @volatile var data: String = ""
    setDaemon(true)

    override def run(): Unit = {
      val s = server.accept()
      try {
        val in = new BufferedReader(
          new InputStreamReader(s.getInputStream, StandardCharsets.US_ASCII))
        val out = new PrintWriter(
          new OutputStreamWriter(s.getOutputStream, StandardCharsets.US_ASCII))
        def send(l: String): Unit = { out.print(l + "\r\n"); out.flush() }
        send("220 mock ESMTP")
        var line = in.readLine()
        while (line != null) {
          commands += line
          val up = line.toUpperCase
          if (up.startsWith("EHLO")) { send("250-mock greets you"); send("250 OK") }
          else if (up.startsWith("MAIL")) send("250 OK")
          else if (up.startsWith("RCPT"))
            send(if (rejectRcpt) "550 no such user" else "250 OK")
          else if (up.startsWith("DATA")) {
            send("354 end with <CRLF>.<CRLF>")
            val sb = new StringBuilder
            var d = in.readLine()
            while (d != null && d != ".") { sb.append(d).append("\r\n"); d = in.readLine() }
            data = sb.toString
            send("250 accepted")
          } else if (up.startsWith("QUIT")) { send("221 bye"); line = null }
          if (line != null) line = in.readLine()
        }
      } finally { s.close(); server.close() }
    }
  }

  test("full SMTP conversation: EHLO, MAIL, RCPT per recipient, dot-stuffed DATA, QUIT") {
    val mock = new MockSmtp(rejectRcpt = false)
    mock.start()
    // body line starting with '.' exercises dot-stuffing both ways
    val msg = EmailSink.buildMessage(
      "hunter@example.com", "a@example.com, b@example.com",
      "WeblogHunter Report", "findings below\n.hidden dot line\ndone",
      "ip,status\n10.0.0.1,500\n")
    new EmailSink.SmtpTransport().send(
      "127.0.0.1", mock.port, "hunter@example.com", "a@example.com, b@example.com", msg)
    mock.join(5000)

    val cmds = mock.commands.toList
    assert(cmds.head.startsWith("EHLO "))
    assert(cmds(1) == "MAIL FROM:<hunter@example.com>")
    assert(cmds(2) == "RCPT TO:<a@example.com>")
    assert(cmds(3) == "RCPT TO:<b@example.com>")
    assert(cmds(4) == "DATA")
    assert(cmds(5) == "QUIT")
    // on the wire the dot line was stuffed ("..hidden"); the mock's
    // readLine view preserves it — un-stuff and compare to the message
    assert(mock.data.contains("..hidden dot line"))
    val unstuffed = mock.data.split("\r\n", -1)
      .map(l => if (l.startsWith("..")) l.drop(1) else l).mkString("\r\n")
    val normalized = msg.replace("\r\n", "\n").replace("\n", "\r\n")
    assert(unstuffed.stripSuffix("\r\n") == normalized.stripSuffix("\r\n"))
    assert(mock.data.contains("Subject: WeblogHunter Report"))
  }

  test("a rejected recipient fails with the server's reply text") {
    val mock = new MockSmtp(rejectRcpt = true)
    mock.start()
    val e = intercept[java.io.IOException] {
      new EmailSink.SmtpTransport().send(
        "127.0.0.1", mock.port, "hunter@example.com", "a@example.com", "Subject: x\r\n\r\nhi")
    }
    assert(e.getMessage.contains("550"))
  }
}
