/* videosd_tpu service worker: offline-capable app shell.
 *
 * PWA packaging parity with the reference's Next.js/next-pwa scaffold
 * (reference: client/public/manifest.json + Next build chain), sized to
 * this client's single-file architecture: precache the shell on install,
 * serve cache-first for shell assets, network-only for everything else
 * (media, /offer, /ws, /stats are live endpoints and must never be
 * cached).  Bump VERSION on any shell change to invalidate old caches.
 */
const VERSION = "videosd-tpu-shell-v1";
const SHELL = ["/", "/app.js", "/client/manifest.webmanifest", "/client/icon.svg"];

self.addEventListener("install", (e) => {
  e.waitUntil(
    caches.open(VERSION).then((c) => c.addAll(SHELL)).then(() => self.skipWaiting())
  );
});

self.addEventListener("activate", (e) => {
  e.waitUntil(
    caches
      .keys()
      .then((keys) =>
        Promise.all(keys.filter((k) => k !== VERSION).map((k) => caches.delete(k)))
      )
      .then(() => self.clients.claim())
  );
});

self.addEventListener("fetch", (e) => {
  const url = new URL(e.request.url);
  if (e.request.method !== "GET") return;
  const isShell =
    SHELL.includes(url.pathname) || url.pathname.startsWith("/client/");
  if (!isShell) return; // live API/media traffic: straight to network
  e.respondWith(
    caches.match(e.request).then(
      (hit) =>
        hit ||
        fetch(e.request).then((resp) => {
          const copy = resp.clone();
          caches.open(VERSION).then((c) => c.put(e.request, copy));
          return resp;
        })
    )
  );
});
