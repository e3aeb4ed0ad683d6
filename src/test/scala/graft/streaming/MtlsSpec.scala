package graft.streaming

import java.io.FileInputStream
import java.net.InetSocketAddress
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpsConfigurator, HttpsParameters, HttpsServer}
import graft.model.HttpRequest
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.Await

/**
 * I4 — mTLS client auth: a hermetic HTTPS server (JDK HttpsServer) with
 * `needClientAuth=true` and a keytool-generated self-signed PKCS12 keystore;
 * [[AsyncEnrich.JdkHttpClient]] configured via [[AsyncEnrich.SslMaterial]]
 * (keystore = client identity, truststore = pinned server CA — the same
 * material distribution shape as the reference's
 * SslConfigHelper.scala:24-48). A client without the trust material must
 * fail the handshake.
 */
class MtlsSpec extends AnyFunSuite {

  private def keytool(ksPath: String, pass: String): Unit = {
    val cmd = Array(
      s"${System.getProperty("java.home")}/bin/keytool",
      "-genkeypair", "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ksPath, "-storepass", pass,
      "-keypass", pass, "-dname", "CN=localhost", "-validity", "2",
      "-ext", "san=ip:127.0.0.1,dns:localhost")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"keytool failed: $out")
  }

  private def serverContext(ksPath: String, pass: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    scala.util.Using.resource(new FileInputStream(ksPath))(ks.load(_, pass.toCharArray))
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pass.toCharArray)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  test("JdkHttpClient with SslMaterial completes mutual TLS; no trust material fails") {
    val dir = java.nio.file.Files.createTempDirectory("mtls").toString
    val ksPath = s"$dir/id.p12"
    val pass = "changeit"
    keytool(ksPath, pass)

    val ctx = serverContext(ksPath, pass)
    val server = HttpsServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new HttpsConfigurator(ctx) {
      override def configure(params: HttpsParameters): Unit = {
        val ssl = ctx.getDefaultSSLParameters
        ssl.setNeedClientAuth(true) // mutual TLS: server demands a client cert
        params.setSSLParameters(ssl)
      }
    })
    server.createContext("/posts", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val resp = """{"id":101}""".getBytes("UTF-8")
        ex.sendResponseHeaders(201, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try {
      val uri = java.net.URI.create(
        s"https://127.0.0.1:${server.getAddress.getPort}/posts")
      // self-signed: the keystore is both the client identity and the CA
      val material = AsyncEnrich.SslMaterial.contextFrom(
        keystorePath = Some(ksPath), keystorePassword = pass,
        truststorePath = Some(ksPath), truststorePassword = pass)
      val ok = new AsyncEnrich.JdkHttpClient(uri, 10000L, Some(material))
      val resp = Await.result(ok.send(HttpRequest("t", "b", 7)), 30.seconds)
      assert(resp.id == 101)

      // no trust material -> handshake must be rejected client-side
      val bad = new AsyncEnrich.JdkHttpClient(uri, 10000L, None)
      assert(Await.ready(bad.send(HttpRequest("t", "b", 7)), 30.seconds)
        .value.get.isFailure)
    } finally server.stop(0)
  }
}
